"""Circuit-level decoding engine over a detector error model.

TPU re-design of the reference's circuit-level pipeline
(studies/studyComplete.py:88-109): given a DEM bundle (H detectors x
mechanisms, L observables x mechanisms, per-mechanism priors), sample
mechanism firings *on device* (each mechanism is an independent Bernoulli of
its prior — the same distribution a stim detector sampler draws from),
decode the detector syndrome with BP(+OSD), and count a logical error when
the predicted observable flip ``L @ e_hat`` differs from the actual
``L @ e``. Sharded over the device mesh exactly like MonteCarloEngine.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from qldpc_tpu.decoders.bp import BPConfig, BPDecoder
from qldpc_tpu.decoders.osd import OSDConfig, OSDDecoder
from qldpc_tpu.mc.metrics import HIST_BINS, Counters, counters_to_dict, zeros_counters
from qldpc_tpu.noise.dem import DEMData
from qldpc_tpu.parallel.mesh import BATCH_AXIS, make_mesh

__all__ = ["DEMEngine", "DEMEngineConfig"]


@dataclasses.dataclass(frozen=True)
class DEMEngineConfig:
    bp: BPConfig = BPConfig()
    osd: OSDConfig | None = OSDConfig()
    batch_size: int = 1024
    osd_fraction: float = 1.0


class DEMEngine:
    """Batched, sharded logical-error estimation for one detector error model."""

    def __init__(self, dem: DEMData, config: DEMEngineConfig = DEMEngineConfig(), mesh=None):
        self.dem = dem
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        if config.batch_size % self.n_devices:
            raise ValueError("batch_size must divide evenly across the mesh")
        self.local_batch = config.batch_size // self.n_devices

        self._bp = BPDecoder(dem.H, config.bp)
        self._osd = OSDDecoder(dem.H, config.osd) if config.osd is not None else None
        self._Hf = jnp.asarray(dem.H, jnp.float32)
        self._Lf = jnp.asarray(dem.L, jnp.float32)
        self._priors_prob = jnp.asarray(dem.priors, jnp.float32)
        self._priors_llr = jnp.asarray(dem.llrs, jnp.float32)
        self._batch_fn = self._build()

    def _build(self):
        local_B = self.local_batch
        M = self.dem.priors.size
        k_osd = max(1, int(round(local_B * self.config.osd_fraction)))

        def local_step(key, n_valid):
            idx = jax.lax.axis_index(BATCH_AXIS)
            key = jax.random.fold_in(key, idx)
            mech = jax.random.bernoulli(
                key, self._priors_prob, (local_B, M)
            ).astype(jnp.int8)
            det = jnp.mod(
                jnp.dot(mech.astype(jnp.float32), self._Hf.T), 2.0
            ).astype(jnp.int8)
            bp_res = self._bp.decode_fn(det, self._priors_llr)
            overflow = jnp.zeros((), jnp.int32)
            if self._osd is not None and k_osd >= local_B:
                osd_sol = self._osd._decode(det, bp_res.llrs, bp_res.hard)
                final = jnp.where(bp_res.converged[:, None], bp_res.hard, osd_sol)
            elif self._osd is not None:
                sel = jnp.argsort(bp_res.converged, stable=True)[:k_osd]
                osd_sol = self._osd._decode(det[sel], bp_res.llrs[sel], bp_res.hard[sel])
                picked = jnp.where(
                    bp_res.converged[sel][:, None], bp_res.hard[sel], osd_sol
                )
                final = bp_res.hard.at[sel].set(picked)
                n_fail = jnp.sum((~bp_res.converged).astype(jnp.int32))
                overflow = jnp.maximum(n_fail - k_osd, 0)
            else:
                final = bp_res.hard

            # logical error: predicted observable flips differ from actual
            # (studyComplete.py:106-109); equivalently L @ (e_hat ^ e) != 0
            residual = (final.astype(jnp.int32) + mech.astype(jnp.int32)) % 2
            obs_diff = jnp.mod(residual.astype(jnp.float32) @ self._Lf.T, 2.0)
            logical = jnp.any(obs_diff != 0, axis=-1)
            if self._osd is None:
                logical = logical | ~bp_res.converged
            conv = bp_res.converged
            mismatch = jnp.any(residual != 0, axis=-1)
            s_hat = jnp.mod(
                jnp.dot(final.astype(jnp.float32), self._Hf.T), 2.0
            ).astype(jnp.int8)
            sol_valid = jnp.all(s_hat == det, axis=-1)
            degenerate = ~logical & mismatch

            sample_ids = idx * local_B + jnp.arange(local_B)
            valid = sample_ids < n_valid
            cnt = lambda mask: jnp.sum((mask & valid).astype(jnp.int32))
            w = jnp.clip(residual.sum(-1), 0, HIST_BINS - 1)
            hist = lambda mask: jnp.zeros((HIST_BINS,), jnp.int32).at[w].add(
                (mask & valid).astype(jnp.int32)
            )
            z = jnp.zeros((), jnp.int32)
            counters = Counters(
                trials=jnp.sum(valid.astype(jnp.int32)),
                logical_errors=cnt(logical),
                bp_converged=cnt(conv),
                bp_faults=cnt(~conv),
                osd_invocations=cnt(~conv) if self._osd is not None else z,
                miscorrected=z,
                incorrectable=z,
                degeneracies=cnt(degenerate),
                valid_degenerate=cnt(degenerate & sol_valid),
                osd_and_logical=cnt(logical & ~conv),
                osd_overflow=overflow,
                sum_iterations=jnp.sum(
                    jnp.where(valid, bp_res.iterations, 0).astype(jnp.int32)
                ),
                hist_bp=hist(degenerate & conv),
                hist_osd=hist(degenerate & ~conv),
                hist_bp_error=hist(logical & conv),
                hist_osd_error=hist(logical & ~conv),
            )
            counters = jax.tree.map(lambda x: x.astype(jnp.int32), counters)
            return jax.tree.map(partial(jax.lax.psum, axis_name=BATCH_AXIS), counters)

        sharded = jax.shard_map(
            local_step, mesh=self.mesh, in_specs=(P(), P()), out_specs=P(),
            check_vma=False,
        )
        return jax.jit(sharded)

    def run(self, shots: int, seed: int = 0) -> dict:
        B = self.config.batch_size
        total = zeros_counters()
        key = jax.random.key(seed)
        for b in range(-(-shots // B)):
            n_valid = min(B, shots - b * B)
            counters = self._batch_fn(jax.random.fold_in(key, b), jnp.int32(n_valid))
            total = total + counters
        return counters_to_dict(total)
