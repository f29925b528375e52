"""Batched L-BFGS relaxation — the MLFF relaxer, as one jitted scan.

Rebuild of the reference torch L-BFGS (ref: adsorbdiff/relaxation/optimizers/
lbfgs_torch.py:22-240).  The reference keeps a Python deque of history vectors
over the *flattened whole batch*, runs the two-loop recursion in Python, and
does one model forward + ASE traj write per step.  Here:

- history is a fixed ``[memory, D]`` ring buffer (D = B*N*3) carried through a
  ``lax.scan``; the two-loop recursion is a ``fori_loop`` over the ring with
  validity masks for unfilled slots — same math, static shapes;
- per-system convergence masks freeze finished systems
  (ref ``update_mask``/``check_convergence`` :74-90) instead of breaking the
  loop; the whole relaxation is ONE device dispatch;
- per-system maxstep clamping via masked max over atoms (ref
  ``determine_step`` :151-162), damping, and the same H0 = 1/alpha scaling;
- fixed-atom force zeroing is the calculator's job (ref ``TorchCalc
  .get_energy_and_forces`` :220-229 — see :func:`make_mlff_energy_forces`).

The reference's CUDA-OOM batch-bisection retry (ref: relaxation/
ml_relaxation.py:49-92) has no analogue: shapes are static and sized by the
bucketing batcher, so memory use is known at compile time.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from adsorbdiff_tpu.data.schema import AtomsBatch
from adsorbdiff_tpu.ops.segment import masked_max

EnergyForcesFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]
# fn(batch[, static_graph]) -> (energy [B], forces [B, N, 3]) with fixed-atom
# forces zeroed


class LBFGSResult(NamedTuple):
    batch: AtomsBatch  # final positions
    energy: jnp.ndarray  # [B] final energy
    forces: jnp.ndarray  # [B, N, 3] final forces (no constraint applied, ref :140-143)
    traj_pos: jnp.ndarray  # [T+1, B, N, 3] (last frame = final relaxed state)
    traj_energy: jnp.ndarray  # [T+1, B]
    traj_forces: jnp.ndarray  # [T+1, B, N, 3]
    nsteps: jnp.ndarray  # [] int32 — steps before batch-wide convergence (freeze point)
    converged: jnp.ndarray  # [B] bool — per-system fmax reached


def lbfgs_relax(
    energy_forces_fn: EnergyForcesFn,
    batch: AtomsBatch,
    *,
    steps: int = 300,
    fmax: float = 0.01,
    maxstep: float = 0.04,
    memory: int = 50,
    damping: float = 1.0,
    alpha: float = 70.0,
    energy_forces_fn_final: Optional[EnergyForcesFn] = None,
    early_exit: bool = True,
    candidate_fn: Optional[Callable[[AtomsBatch], object]] = None,
) -> LBFGSResult:
    """Run batched L-BFGS (defaults = the published relaxation config,
    ref: configs/denoising/painn_so3.yml:18-27).

    ``early_exit`` mirrors the reference's ``while iteration < steps and not
    converged`` loop (ref lbfgs_torch.py:93-117): once every system in the
    batch converges, the remaining model forwards are SKIPPED via a
    ``lax.while_loop``.  The result (positions, trajectory, energies) is
    identical to the full scan — frozen systems stop moving, so every
    post-convergence frame equals the frozen state; the fill after the loop
    reproduces them exactly.  Disabled automatically for ``fmax <= 0``
    (fixed-budget benchmarking)."""
    b, n, _ = batch.pos.shape
    d = b * n * 3
    h0 = 1.0 / float(alpha)
    atom3 = batch.atom_mask[..., None]

    def flat(x):
        return x.reshape(d)

    def ef(pos, cand=None):
        if candidate_fn is None:
            e, f = energy_forces_fn(batch.replace(pos=pos))
        else:
            e, f = energy_forces_fn(batch.replace(pos=pos), cand)
        f = jnp.where(atom3, f, 0.0)
        return e, f

    def refresh_candidates(pos, cand):
        """Verlet-list maintenance (see ops/pbc.py::CandidateTable): rebuild
        the candidate tables via lax.cond once the accumulated displacement
        spends the exactness margin; until then the model refreshes the
        neighbor table from the cached candidates at O(N*Kc) cost."""
        from adsorbdiff_tpu.ops.pbc import CandidateTable

        leaves = jax.tree.leaves(cand, is_leaf=lambda x: isinstance(x, CandidateTable))
        tables = [t for t in leaves if isinstance(t, CandidateTable)]
        need = jnp.asarray(False)
        for t in tables:
            d2 = jnp.sum((pos - t.pos0) ** 2, axis=-1)  # [B, N]
            disp = jnp.sqrt(masked_max(d2, batch.atom_mask, axis=1))  # [B]
            need |= jnp.any(4.0 * disp >= t.margin)
        return jax.lax.cond(
            need,
            lambda p: candidate_fn(batch.replace(pos=p)),
            lambda p: cand,
            pos,
        )

    class Carry(NamedTuple):
        pos: jnp.ndarray  # [B, N, 3]
        r0: jnp.ndarray  # [D]
        f0: jnp.ndarray  # [D]
        s_buf: jnp.ndarray  # [M, D]
        y_buf: jnp.ndarray  # [M, D]
        rho_buf: jnp.ndarray  # [M]
        frozen_at: jnp.ndarray  # [] int32 (steps if never converged)
        cand: object = ()  # Verlet candidate tables (pytree; () when unused)

    def two_loop(q, s_buf, y_buf, rho_buf, n_hist):
        """Standard two-loop recursion over the ring buffer (ref :179-193).

        Pushes shift the buffers left and write at the TAIL (newest entry at
        slot memory-1), so the n_hist valid entries live at slots
        [memory - n_hist, memory) in oldest->newest order; the backward pass
        walks the tail newest->oldest, the forward pass oldest->newest.
        """
        m = s_buf.shape[0]

        def bwd(j, qa):
            q, alpha_vec = qa
            slot = m - 1 - j  # newest -> oldest
            valid = j < n_hist
            a_i = rho_buf[slot] * jnp.dot(s_buf[slot], q)
            a_i = jnp.where(valid, a_i, 0.0)
            q = q - a_i * y_buf[slot]
            return q, alpha_vec.at[slot].set(a_i)

        q, alpha_vec = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros(m, q.dtype)))
        z = h0 * q

        def fwd(slot, z):
            valid = slot >= m - n_hist
            beta = rho_buf[slot] * jnp.dot(y_buf[slot], z)
            upd = s_buf[slot] * (alpha_vec[slot] - beta)
            return z + jnp.where(valid, upd, 0.0)

        return jax.lax.fori_loop(0, m, fwd, z)

    def step(carry: Carry, it: jnp.ndarray):
        cand = carry.cand
        if candidate_fn is not None:
            cand = refresh_candidates(carry.pos, cand)
        energy, forces = ef(carry.pos, cand)

        # per-system max force over real atoms (ref check_convergence :74-90)
        fnorm = jnp.linalg.norm(forces, axis=-1)  # [B, N]
        max_f = masked_max(fnorm, batch.atom_mask, axis=1)  # [B]
        update_sys = max_f >= fmax  # True = keep moving
        all_converged = jnp.logical_not(jnp.any(update_sys))
        frozen_at = jnp.where(
            all_converged & (carry.frozen_at >= steps), it, carry.frozen_at
        )
        active = jnp.logical_not(all_converged) & (carry.frozen_at >= steps)

        r = flat(carry.pos)
        f = flat(forces)

        # push (s, y, rho) once history exists (ref :170-177); never push
        # after the batch froze (a zero step would make rho = 1/0)
        s0 = r - carry.r0
        y0 = -(f - carry.f0)
        rho0 = 1.0 / jnp.dot(y0, s0)
        has_hist = (it > 0) & active
        s_buf = jnp.where(has_hist, jnp.roll(carry.s_buf, -1, axis=0).at[-1].set(s0), carry.s_buf)
        y_buf = jnp.where(has_hist, jnp.roll(carry.y_buf, -1, axis=0).at[-1].set(y0), carry.y_buf)
        rho_buf = jnp.where(has_hist, jnp.roll(carry.rho_buf, -1).at[-1].set(rho0), carry.rho_buf)
        n_hist = jnp.minimum(it, memory).astype(jnp.int32)

        q = -f
        z = two_loop(q, s_buf, y_buf, rho_buf, n_hist)
        p = (-z).reshape(b, n, 3)

        # per-system maxstep clamp (ref determine_step :151-162)
        steplen = jnp.linalg.norm(p, axis=-1)  # [B, N]
        longest = masked_max(steplen, batch.atom_mask, axis=1)  # [B]
        scale = jnp.minimum(longest, maxstep) / (longest + 1e-7)
        dr = p * scale[:, None, None] * damping

        # freeze converged systems (ref set_positions update_mask :66-69) and
        # the whole batch once it has fully converged
        move = (update_sys[:, None, None] & atom3) & active
        tiny = jnp.max(jnp.abs(dr)) < 1e-7  # ref :195-197
        new_pos = jnp.where(move & jnp.logical_not(tiny), carry.pos + dr, carry.pos)

        # the reference's "same configuration" early return (:195-197) skips
        # both the position update and the r0/f0 refresh
        keep = active & jnp.logical_not(tiny)
        new_carry = Carry(
            pos=new_pos,
            r0=jnp.where(keep, r, carry.r0),
            f0=jnp.where(keep, f, carry.f0),
            s_buf=s_buf,
            y_buf=y_buf,
            rho_buf=rho_buf,
            frozen_at=frozen_at,
            cand=cand,
        )
        return new_carry, (carry.pos, energy, forces)

    init = Carry(
        pos=batch.pos,
        r0=jnp.zeros(d, batch.pos.dtype),
        f0=jnp.zeros(d, batch.pos.dtype),
        s_buf=jnp.zeros((memory, d), batch.pos.dtype),
        y_buf=jnp.zeros((memory, d), batch.pos.dtype),
        rho_buf=jnp.zeros(memory, batch.pos.dtype),
        frozen_at=jnp.asarray(steps, jnp.int32),
        cand=candidate_fn(batch) if candidate_fn is not None else (),
    )
    if not (early_exit and fmax > 0.0):
        carry, (traj_pos, traj_e, traj_f) = jax.lax.scan(step, init, jnp.arange(steps))
    else:
        def body(state):
            it, carry, tp, te, tf = state
            new_carry, (p_out, e_out, f_out) = step(carry, it)
            tp = jax.lax.dynamic_update_index_in_dim(tp, p_out, it, 0)
            te = jax.lax.dynamic_update_index_in_dim(te, e_out, it, 0)
            tf = jax.lax.dynamic_update_index_in_dim(tf, f_out, it, 0)
            return it + 1, new_carry, tp, te, tf

        def cond(state):
            it, carry = state[0], state[1]
            return (it < steps) & (carry.frozen_at >= steps)

        state0 = (
            jnp.asarray(0, jnp.int32),
            init,
            jnp.zeros((steps, b, n, 3), batch.pos.dtype),
            jnp.zeros((steps, b), batch.pos.dtype),
            jnp.zeros((steps, b, n, 3), batch.pos.dtype),
        )
        it_end, carry, traj_pos, traj_e, traj_f = jax.lax.while_loop(cond, body, state0)
        # frames at/after the exit step equal the frozen state (positions
        # stopped moving; the scan would have re-emitted them verbatim)
        # (full-build forward: exact regardless of the candidate margin state)
        e_fill, f_fill = ef(carry.pos, None) if candidate_fn is not None else ef(carry.pos)
        mask = jnp.arange(steps) >= it_end
        traj_pos = jnp.where(mask[:, None, None, None], carry.pos[None], traj_pos)
        traj_e = jnp.where(mask[:, None], e_fill[None], traj_e)
        traj_f = jnp.where(mask[:, None, None, None], f_fill[None], traj_f)

    final_fn = energy_forces_fn_final or energy_forces_fn
    final_e, final_f = final_fn(batch.replace(pos=carry.pos))  # no constraint (ref :140-143)
    fnorm = jnp.linalg.norm(jnp.where(atom3, final_f, 0.0), axis=-1)
    converged = masked_max(fnorm, batch.atom_mask, axis=1) < fmax

    # the scan emits pre-update frames; append the final relaxed state so the
    # last trajectory frame IS the result (as the sampler does) — eval tooling
    # reads the last frame/energy as "final"
    traj_pos = jnp.concatenate([traj_pos, carry.pos[None]], axis=0)
    traj_e = jnp.concatenate([traj_e, final_e[None]], axis=0)
    traj_f = jnp.concatenate([traj_f, final_f[None]], axis=0)

    return LBFGSResult(
        batch=batch.replace(pos=carry.pos),
        energy=final_e,
        forces=final_f,
        traj_pos=traj_pos,
        traj_energy=traj_e,
        traj_forces=traj_f,
        nsteps=jnp.minimum(carry.frozen_at, steps),
        converged=converged,
    )


def make_mlff_energy_forces(model, variables) -> EnergyForcesFn:
    """Wrap an s2ef model into the calculator contract: energy [B],
    forces [B, N, 3] with fixed-atom forces zeroed
    (ref: lbfgs_torch.py TorchCalc :215-229).  ``static_graph`` (optional)
    carries Verlet candidate tables into the model's graph build."""

    def fn(batch: AtomsBatch, static_graph=None):
        out = model.apply(variables, batch, static_graph)
        forces = jnp.where(batch.fixed[..., None], 0.0, out["forces"])
        return out["energy"], forces

    return fn
