"""Circuit-level decoding engine over a detector error model.

TPU re-design of the reference's circuit-level pipeline
(studies/studyComplete.py:88-109): given a DEM bundle (H detectors x
mechanisms, L observables x mechanisms, per-mechanism priors), sample
mechanism firings *on device* (each mechanism is an independent Bernoulli of
its prior — the same distribution a stim detector sampler draws from),
decode the detector syndrome with BP(+OSD), and count a logical error when
the predicted observable flip ``L @ e_hat`` differs from the actual
``L @ e``.

``DEMEngine`` is ``MonteCarloEngine`` with the channel sampler swapped for
per-mechanism Bernoulli draws: it inherits the full machinery — shard_map
over the device mesh, mesh-invariant per-sample RNG, tiered compacted OSD
with the all-converged skip, fused/async dispatch, int64 host-side counter
accumulation, and mid-run checkpoint/resume.

Notes on the counter schema: the miscorrected/incorrectable split is a
weight-vs-code-distance classification (studies/study.py:83-87) that has no
analog in mechanism space, so every logical error lands in
``incorrectable`` (distance is pinned to 0).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from qldpc_tpu.decoders.bp import BPDecoder
from qldpc_tpu.decoders.osd import OSDDecoder
from qldpc_tpu.mc.engine import EngineConfig, MonteCarloEngine
from qldpc_tpu.mc.metrics import counters_to_dict
from qldpc_tpu.noise.dem import DEMData
from qldpc_tpu.parallel.mesh import make_mesh

__all__ = ["DEMEngine", "DEMEngineConfig"]


@dataclasses.dataclass(frozen=True)
class DEMEngineConfig(EngineConfig):
    channel: str = "dem"


@dataclasses.dataclass(frozen=True)
class _DEMCodeShim:
    """Minimal ``code`` stand-in (name only) for checkpoint paths and sweep
    result labeling; a DEM has no CSS structure to expose."""

    name: str


class DEMEngine(MonteCarloEngine):
    """Batched, sharded logical-error estimation for one detector error model."""

    def __init__(
        self,
        dem: DEMData,
        config: DEMEngineConfig = DEMEngineConfig(),
        mesh=None,
        name: str = "dem",
    ):
        if config.channel != "dem":
            config = dataclasses.replace(config, channel="dem")
        self.dem = dem
        self.code = _DEMCodeShim(name=name)
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        if config.batch_size % self.n_devices:
            raise ValueError("batch_size must divide evenly across the mesh")
        self.local_batch = config.batch_size // self.n_devices

        # weight-vs-distance classification is undefined for DEM mechanisms
        self.distance = 0
        self.n_rounds = 0
        self.n_qubits = dem.H.shape[1]
        self._H_dec = dem.H
        self._H_space = dem.H
        self.n_vars = dem.H.shape[1]
        self.m_checks = dem.H.shape[0]

        self._bp = BPDecoder(dem.H, config.bp)
        self._osd = OSDDecoder(dem.H, config.osd) if config.osd is not None else None
        self._Hf = jnp.asarray(dem.H, jnp.float32)
        self._Lf = jnp.asarray(dem.L, jnp.float32)
        self._priors_prob = jnp.asarray(dem.priors, jnp.float32)
        self._priors_llr = jnp.asarray(dem.llrs, jnp.float32)
        self._batch_fn = self._build()

    def _sample(self, keys, p):
        """Per-mechanism Bernoulli firings from per-sample keys. The traced
        error-rate scalar ``p`` is ignored — a DEM carries its own priors
        (studyComplete.py:85-89); sweeps over a DEM are sweeps over DEMs."""
        del p
        mech = jax.vmap(lambda k: jax.random.bernoulli(k, self._priors_prob))(
            keys
        ).astype(jnp.int8)
        return mech, self._syndrome(mech), self._priors_llr

    def run(self, shots: int, seed: int = 0, checkpoint=None) -> dict:
        """Estimate the logical error rate over ``shots`` sampled shots."""
        if checkpoint is not None:
            counters = checkpoint.run_rate(self, 0.0, shots, seed)
        else:
            counters = self.run_rate(0.0, shots, seed=seed)
        return counters_to_dict(counters)
