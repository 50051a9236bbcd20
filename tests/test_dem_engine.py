import numpy as np

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders import BPConfig
from qldpc_tpu.decoders.osd import OSDConfig
from qldpc_tpu.mc import (
    DEMEngine,
    DEMEngineConfig,
    EngineConfig,
    MonteCarloEngine,
    counters_to_dict,
)
from qldpc_tpu.noise import DEMData


def steane_dem(p):
    """A code-capacity channel expressed as a DEM: mechanisms are the 7
    single-qubit flips, detectors are the Steane checks, observable is Lx."""
    code = get_code("steane")
    return DEMData(H=code.Hx, L=code.Lx, priors=np.full(7, p))


class TestDEMEngine:
    def test_runs_and_counts(self):
        eng = DEMEngine(
            steane_dem(0.05),
            DEMEngineConfig(bp=BPConfig(max_iter=30), osd=OSDConfig(order=0),
                            batch_size=256),
        )
        d = eng.run(shots=512, seed=0)
        assert d["trials"] == 512
        assert 0 <= d["ler"] <= 1

    def test_matches_code_capacity_engine_statistically(self):
        """A DEM that encodes the code-capacity channel must reproduce the
        code-capacity engine's LER within sampling error."""
        p = 0.08
        shots = 4096
        dem_eng = DEMEngine(
            steane_dem(p),
            DEMEngineConfig(bp=BPConfig(max_iter=30), osd=OSDConfig(order=0),
                            batch_size=512),
        )
        d_dem = dem_eng.run(shots=shots, seed=1)

        cc_eng = MonteCarloEngine(
            get_code("steane"),
            EngineConfig(bp=BPConfig(max_iter=30), osd=OSDConfig(order=0),
                         batch_size=512),
        )
        d_cc = counters_to_dict(cc_eng.run_rate(p, trials=shots, seed=2))

        sigma = np.sqrt(max(d_cc["ler"] * (1 - d_cc["ler"]), 1e-9) / shots)
        assert abs(d_dem["ler"] - d_cc["ler"]) < 5 * sigma + 0.01

    def test_heterogeneous_priors(self):
        """Mechanism-dependent priors flow into both sampling and LLRs."""
        code = get_code("steane")
        priors = np.array([0.001, 0.001, 0.1, 0.001, 0.1, 0.001, 0.001])
        dem = DEMData(H=code.Hx, L=code.Lx, priors=priors)
        eng = DEMEngine(
            dem, DEMEngineConfig(bp=BPConfig(max_iter=30), batch_size=256)
        )
        d = eng.run(shots=512, seed=3)
        assert d["trials"] == 512
