"""Differentiable binaural rendering — inverse rendering / source localization.

A capability beyond the reference: the spatialization pipeline is linear in
the HRTF filters, so with *smooth* interpolation weights (no degree rounding,
no C-truncation case quirks, proper azimuth wraparound) the render becomes
differentiable with respect to the source trajectory (azi, ele, r).  That
enables gradient-based source localization: given a binaural recording and
the dry signal, recover the trajectory by descending the waveform loss.

The parity engine (engine/renderer.py) keeps the reference's exact quirky
semantics; this module is the clean mathematical variant for optimization.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..hrtf.kemar import AZIMUTH_COUNTS, AZIMUTH_INC, AZIMUTH_OFFSET, ELEVATIONS, HRTFDatabase
from ..ops import fft as fft_ops

_INC = jnp.asarray(AZIMUTH_INC)
_COUNTS = jnp.asarray(np.asarray(AZIMUTH_COUNTS, np.float32))
_OFFSET = jnp.asarray(np.asarray(AZIMUTH_OFFSET[:-1], np.int32))


def smooth_coeffs(azi: jax.Array, ele: jax.Array):
    """Smooth bilinear interpolation over the KEMAR grid.

    azi, ele: (...,) degrees (azi wraps mod 360; ele clipped to [-40, 90]).
    Returns (indices (..., 4) int32, weights (..., 4) float32); weights are
    differentiable in (azi, ele) almost everywhere and sum to 1.
    """
    azi = jnp.mod(azi, 360.0)
    ele = jnp.clip(ele, -40.0, 90.0)
    row_f = (ele + 40.0) / 10.0
    row0 = jnp.clip(jnp.floor(row_f), 0, len(ELEVATIONS) - 1).astype(jnp.int32)
    row1 = jnp.minimum(row0 + 1, len(ELEVATIONS) - 1)
    fe = jnp.clip(row_f - row0.astype(jnp.float32), 0.0, 1.0)

    def row_bracket(row):
        inc = _INC[row]
        n = _COUNTS[row]
        j_f = jnp.floor(azi / inc)
        j = jnp.mod(j_f.astype(jnp.int32), n.astype(jnp.int32))
        j1 = jnp.mod(j + 1, n.astype(jnp.int32))
        fa = jnp.clip((azi - j_f * inc) / inc, 0.0, 1.0)
        return _OFFSET[row] + j, _OFFSET[row] + j1, fa

    i00, i01, fa0 = row_bracket(row0)
    i10, i11, fa1 = row_bracket(row1)
    idx = jnp.stack([i00, i01, i10, i11], axis=-1).astype(jnp.int32)
    w = jnp.stack(
        [(1 - fa0) * (1 - fe), fa0 * (1 - fe), (1 - fa1) * fe, fa1 * fe], axis=-1
    ).astype(jnp.float32)
    return idx, w


class DifferentiableRenderer:
    """Smooth, jit/grad-compatible offline renderer.

    ``render(signal, positions)`` with positions (B, 3) = (azi, ele, r) as a
    traced array returns (B*fpb, 2); gradients flow to the positions.
    """

    def __init__(self, db: HRTFDatabase, config: EngineConfig | None = None):
        self.db = db
        self.config = config or db.config
        sp = db.spectra
        self._tabs = tuple(
            jnp.asarray(plane[:, ch, :].astype(np.float32))
            for plane in (np.real(sp), np.imag(sp))
            for ch in (0, 1)
        )  # (rL, rR, iL, iR)

    def _forward(self, signal: np.ndarray, num_blocks: int):
        from ..engine.plan import fed_stream

        cfg = self.config
        fed = fed_stream(np.asarray(signal, np.float32), num_blocks, cfg)
        stream = np.concatenate([np.zeros(cfg.history_len, np.float32), fed])
        return fft_ops.rfft_sliding_split(
            jnp.asarray(stream), num_blocks, cfg.frames_per_buffer, cfg.pad_len
        )

    def render_spectra(self, xr: jax.Array, xi: jax.Array, positions: jax.Array) -> jax.Array:
        """Differentiable core: forward planes + (B, 3) positions -> (B, fpb, 2)."""
        cfg = self.config
        azi, ele, r = positions[:, 0], positions[:, 1], positions[:, 2]
        idx, w = smooth_coeffs(azi, ele)
        hr_l, hr_r, hi_l, hi_r = self._tabs

        # smooth distance factor (same formula as the engine, fp32 direct)
        rs = r / cfg.distance_scale
        fsvs = jnp.float32(cfg.fsvs)
        k = jnp.arange(cfg.num_bins, dtype=jnp.float32)
        arg = 2.0 * jnp.pi * fsvs * rs[:, None] * k[None, :] / cfg.num_bins
        inv_frac = 1.0 / (1.0 + fsvs * rs * rs)
        dr = jnp.cos(arg) * inv_frac[:, None]
        di = -jnp.sin(arg) * inv_frac[:, None]
        xdr = xr * dr - xi * di
        xdi = xr * di + xi * dr

        def blend(tab):
            g = w[:, 0:1] * jnp.take(tab, idx[:, 0], axis=0)
            for j in range(1, 4):
                g = g + w[:, j : j + 1] * jnp.take(tab, idx[:, j], axis=0)
            return g

        qs_r, qs_i = [], []
        for gr_t, gi_t in ((hr_l, hi_l), (hr_r, hi_r)):
            gr, gi = blend(gr_t), blend(gi_t)
            qs_r.append(xdr * gr - xdi * gi)
            qs_i.append(xdr * gi + xdi * gr)
        y = fft_ops.irfft_tail_split(
            jnp.stack(qs_r), jnp.stack(qs_i), cfg.pad_len, cfg.frames_per_buffer
        )  # (2, B, fpb)
        return jnp.transpose(y, (1, 2, 0))

    def render(self, signal: np.ndarray, positions) -> jax.Array:
        positions = jnp.asarray(positions, dtype=jnp.float32)
        xr, xi = self._forward(signal, int(positions.shape[0]))
        out = self.render_spectra(xr, xi, positions)
        return out.reshape(-1, 2)

    def localize(
        self,
        signal: np.ndarray,
        target: np.ndarray,
        init_positions,
        steps: int = 300,
        lr: float = 2.0,
        optimize_r: bool = True,
        segment_blocks: int | None = None,
    ):
        """Recover per-block source positions from a binaural recording.

        target: (B*fpb, 2) rendered/recorded stereo of ``signal``.
        init_positions: (B, 3) starting guess.
        segment_blocks: None -> one grid candidate initializes every block
        (static or slowly-moving source); an int -> the grid search picks a
        winner per segment of that many blocks, so moving trajectories start
        each segment in the right basin.
        optimize_r=False pins every block's radius to the CALLER's
        init_positions values (grid candidates are evaluated at those
        per-block radii, and the Adam mask freezes them), fitting only the
        directions.
        Returns (fitted positions (B, 3) np.ndarray, loss history list);
        history[0] and history[-1] are fullband losses (start / best found),
        interior entries are the per-stage (lowpassed) descent losses.
        """
        import optax

        if segment_blocks is not None and segment_blocks <= 0:
            raise ValueError(
                f"segment_blocks must be a positive int, got {segment_blocks}"
            )
        cfg = self.config
        pos0 = jnp.asarray(init_positions, dtype=jnp.float32)
        b = int(pos0.shape[0])
        xr, xi = self._forward(signal, b)
        tgt = jnp.asarray(np.asarray(target, np.float32).reshape(b, cfg.frames_per_buffer, 2))

        mask = jnp.asarray([1.0, 1.0, 1.0 if optimize_r else 0.0], dtype=jnp.float32)

        def smoother(width):
            if width <= 1:
                return lambda x: x
            win = jnp.asarray((np.hanning(width) / np.hanning(width).sum()).astype(np.float32))

            def f(blocks):  # (B, fpb, 2) -> same, lowpassed along time
                t = jnp.transpose(blocks, (2, 0, 1)).reshape(2, 1, -1)
                k = win[None, None, :]
                y = jax.lax.conv_general_dilated(
                    t, k, (1,), "SAME", dimension_numbers=("NCH", "OIH", "NCH")
                )
                return jnp.transpose(y.reshape(2, b, -1), (1, 2, 0))

            return f

        def make_loss(width):
            sm = smoother(width)
            tgt_s = sm(tgt)

            def loss_fn(pos):
                out = sm(self.render_spectra(xr, xi, pos))
                return jnp.mean((out - tgt_s) ** 2) * 1e4  # scaled for optimizer health

            return loss_fn

        # Stage 1 — coarse grid init.  Waveform MSE is multimodal in
        # direction (ITD phase cycles, and an "attenuate by pushing the
        # source away" minimum), so a vectorized direction sweep picks the
        # right basin before any gradient step.
        azis = np.arange(0.0, 360.0, 10.0)
        eles = np.arange(-40.0, 91.0, 10.0)
        if optimize_r:
            radii = np.array([0.25, 0.5, 1.0, 1.5, 2.5, 4.0])
        else:
            # candidates' r column is ignored below (the caller's per-block
            # radii are substituted), so one dummy value suffices
            radii = np.array([1.0])
        aa, ee, rr = np.meshgrid(azis, eles, radii, indexing="ij")
        cand = np.stack([aa.ravel(), ee.ravel(), rr.ravel()], axis=-1).astype(np.float32)

        # wide-basin (lowpassed) per-block losses for every grid candidate
        sm64 = smoother(64)
        tgt64 = sm64(tgt)

        # fixed-size candidate chunks: ONE compiled program serves both the
        # coarse (stage 1) and fine (stage 3) sweeps — remote compiles cost
        # 20 s–5 min each here — and peak memory is bounded at
        # (chunk, b, bins) planes instead of (C, b, bins) with C up to 5280
        chunk_c = 256

        @jax.jit
        def _grid_chunk(cands):  # (chunk_c, 3) -> (chunk_c, b)
            def one(c):
                p = jnp.broadcast_to(c, (b, 3))
                if not optimize_r:
                    # fit directions AT the caller's per-block radii, not at
                    # the candidate's dummy r (distance delay/rolloff bias)
                    p = jnp.concatenate(
                        [p[:, :2], pos0[:, 2:3]], axis=1
                    )
                out = sm64(self.render_spectra(xr, xi, p))
                return jnp.mean((out - tgt64) ** 2, axis=(1, 2)) * 1e4  # (b,)

            return jax.vmap(one)(cands)

        def grid_losses_per_block(cand_np):
            outs = []
            for c0 in range(0, len(cand_np), chunk_c):
                ch = cand_np[c0 : c0 + chunk_c]
                pad = chunk_c - len(ch)
                if pad:  # pad to the fixed chunk shape (one program)
                    ch = np.concatenate([ch, np.repeat(ch[-1:], pad, axis=0)])
                gl = np.asarray(_grid_chunk(jnp.asarray(ch)))
                outs.append(gl[: chunk_c - pad] if pad else gl)
            return np.concatenate(outs)  # (C, b)

        gl_blocks = grid_losses_per_block(cand)
        seg = segment_blocks or b
        pos_np = np.empty((b, 3), np.float32)
        for s0 in range(0, b, seg):
            s1 = min(s0 + seg, b)
            seg_loss = gl_blocks[:, s0:s1].mean(axis=1)
            pos_np[s0:s1] = cand[int(np.argmin(seg_loss))]
        if not optimize_r:
            # the grid carried a dummy r; the caller's radii are the truth
            # (and the Adam mask keeps them frozen through every stage)
            pos_np[:, 2] = np.asarray(pos0[:, 2])
        pos = jnp.asarray(pos_np)

        # Stage 2 — coarse-to-fine gradient refinement (per-block positions):
        # heavy lowpass first (wide, smooth basin for r/ITD), full band last.
        # The best fullband-loss position ever visited is what's returned —
        # gradient stages can wander out of a good basin on hard signals.
        fullband_loss = jax.jit(make_loss(1))
        best_pos, best_loss = pos, float(fullband_loss(pos))
        # one axis for the whole history: FULLBAND loss (the lowpassed grid
        # minimum is not commensurable with the descent entries)
        history = [best_loss]

        # widths 4 and 1 recur across stage 2 and stage 3; fresh @jax.jit
        # closures would recompile identical programs (remote compiles are
        # minutes here) — cache per (width, rate)
        step_cache: dict[tuple, tuple] = {}

        def _get_step(width, rate):
            key = (width, round(rate, 12))
            if key not in step_cache:
                loss_fn = make_loss(width)
                opt = optax.adam(rate)

                @jax.jit
                def step(pos, state, _loss_fn=loss_fn, _opt=opt):
                    loss, grad = jax.value_and_grad(_loss_fn)(pos)
                    updates, state = _opt.update(grad * mask[None, :], state)
                    return optax.apply_updates(pos, updates), state, loss

                step_cache[key] = (opt, step)
            return step_cache[key]

        def descend(pos, schedule, n_steps, rate):
            nonlocal best_pos, best_loss
            for width in schedule:
                opt, step = _get_step(width, rate)
                state = opt.init(pos)

                for i in range(max(1, n_steps // len(schedule))):
                    pos, state, loss = step(pos, state)
                    history.append(float(loss))
                    if i % 10 == 0 or i == n_steps // len(schedule) - 1:
                        fl = float(fullband_loss(pos))
                        if fl < best_loss:
                            best_pos, best_loss = pos, fl
            return pos

        pos = descend(pos, [64, 16, 4, 1], steps, lr)

        # Stage 3 — direction re-grid at the fitted radius.  The coarse grid's
        # 10-degree spacing and sparse radii can strand stage 2 in an
        # interpolation-cell ripple (the waveform loss has ~5e-4-deep local
        # minima one cell away from the exact zero); with r pinned to the
        # fitted value a fine direction sweep is cheap and lands in the true
        # basin, after which a short full-band polish converges.
        fine_az = np.arange(0.0, 360.0, 3.0)
        fine_el = np.arange(-40.0, 91.0, 3.0)
        fa, fe_ = np.meshgrid(fine_az, fine_el, indexing="ij")
        bp = np.asarray(best_pos)
        pos_np = np.empty((b, 3), np.float32)
        gl2_cache: dict[float, tuple] = {}  # fine-grid losses per distinct r
        for s0 in range(0, b, seg):
            s1 = min(s0 + seg, b)
            r_fit = round(float(bp[s0:s1, 2].mean()), 6)
            if r_fit not in gl2_cache:
                cand2 = np.stack(
                    [fa.ravel(), fe_.ravel(), np.full(fa.size, r_fit)], axis=-1
                ).astype(np.float32)
                gl2_cache[r_fit] = (cand2, grid_losses_per_block(cand2))
            cand2, gl2_all = gl2_cache[r_fit]
            gl2 = gl2_all[:, s0:s1]
            pos_np[s0:s1] = cand2[int(np.argmin(gl2.mean(axis=1)))]
            pos_np[s0:s1, 2] = bp[s0:s1, 2]
        pos = jnp.asarray(pos_np)
        fl = float(fullband_loss(pos))
        if fl < best_loss:
            best_pos, best_loss = pos, fl
        descend(pos, [4, 1], max(40, steps // 4), lr * 0.5)

        history.append(best_loss)
        return np.asarray(best_pos), history
