"""Continuous-batching MLFF relaxation: retire converged systems, refill slots.

The barrier engine (:mod:`adsorbdiff_tpu.relaxation.ml_relaxation` +
:func:`adsorbdiff_tpu.relaxation.lbfgs.lbfgs_relax`) mirrors the reference's
semantics: a batch runs until its SLOWEST system converges (ref:
adsorbdiff/relaxation/optimizers/lbfgs_torch.py:92-143 — the while loop breaks
only on batch-wide convergence), so early-converging systems keep occupying
batch slots and paying full model forwards.  On real relaxation workloads
convergence times are widely spread, which makes this the dominant waste on
the relaxation-bound pipeline (docs/PERF.md: relaxation is ~96.5% of
end-to-end wall time; the forward cost of a dense ``[B, N, ...]`` batch is
the same whether 1 or B systems still need it).

This engine runs L-BFGS in fixed-size CHUNKS of device steps (one ``lax.scan``
dispatch per chunk).  At every chunk boundary, converged (or budget-exhausted)
systems retire — their variable-length trajectories drain through the async
writer — and pending systems refill the freed slots, so occupancy stays at
100% until the final drain.  Expected win over the barrier engine is
``E[max of B convergence times] / E[convergence time]`` minus chunk
quantization (~chunk_steps/2 per system).

Semantics: **per-system L-BFGS**.  The history ring buffer is per-system
(``[memory, B, N*3]`` with per-system rho), i.e. every system follows exactly
the trajectory it would follow alone in a batch of one
(:func:`lbfgs_relax` at B=1; parity-tested in tests/test_continuous.py) —
unlike the reference's shared-history batch L-BFGS, whose two-loop recursion
couples unrelated systems through global dot products over the flattened
batch (ref: lbfgs_torch.py:179-193).  Decoupling is what makes slot refill
exact: a retiring system's curvature history leaves with it, and a refilled
slot starts from a clean H0.  Trajectory layout matches the reference's
variable-length trajs (frames up to the converging step, plus one final
frame; the reference breaks its while loop at convergence, so its trajs stop
there too).  Divergence, documented: the final frame's forces are
fixed-atom-zeroed like every other frame (the reference finalizes with one
unconstrained forward, lbfgs_torch.py:140-143); final energies are identical.
"""
from __future__ import annotations

import functools
import logging
import os
import time
from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adsorbdiff_tpu.data.schema import AtomsBatch, System, collate
from adsorbdiff_tpu.ops.segment import masked_max
from adsorbdiff_tpu.relaxation.ml_relaxation import _AsyncWriter
from adsorbdiff_tpu.runtime.trajectory import Trajectory, check_traj_files


def resolve_continuous(relax_opt: Optional[dict], fmax: float, mesh=None,
                       slots: Optional[int] = None,
                       num_relaxation_batches: Optional[int] = None) -> bool:
    """Resolve ``relax_opt["continuous"]`` — default ``"auto"``.

    ``True``/``False`` are explicit overrides.  ``"auto"`` selects the
    continuous engine exactly when its measured win condition holds
    (docs/PERF.md round 4): convergence-based stopping (``fmax > 0``)
    spreads per-system step counts, which is where slot refill beats the
    barrier engine (1.19–1.54x measured on TPU under budget spreads);
    fixed-budget runs (``fmax <= 0``, zero spread) keep the barrier scan,
    which is strictly cheaper there (0.86x).  Multi-host runs keep the win:
    each process runs its own engine over its shard of the stream.  Auto
    falls back to the barrier engine on meshes that do not divide the
    (per-process) slot count and when
    ``num_relaxation_batches`` caps the run (the continuous engine streams
    systems, not batches, so it cannot honor a batch cap — ref semantics:
    ocp_trainer.py:576).

    The effective threshold is ``relax_opt["fmax"]`` when present (both
    engines treat it as the authoritative override), else ``fmax``.
    """
    opt = relax_opt or {}
    choice = opt.get("continuous", "auto")
    if isinstance(choice, str) and choice != "auto":
        # YAML round-trips like continuous: "false" must not bool()-coerce
        # to True — parse the common spellings, reject the rest loudly.
        lowered = choice.strip().lower()
        if lowered in ("true", "on", "yes", "1"):
            return True
        if lowered in ("false", "off", "no", "0"):
            return False
        raise ValueError(
            f"relax_opt['continuous'] must be true/false/'auto', got {choice!r}"
        )
    if choice != "auto":
        return bool(choice)
    fmax = float(opt.get("fmax", fmax))  # engines honor the opt-level override
    if fmax <= 0:
        return False
    if num_relaxation_batches is not None and num_relaxation_batches < int(1e9):
        logging.info(
            "relax_opt.continuous=auto: task.num_relaxation_batches=%d set — "
            "the continuous engine streams systems and cannot honor a batch "
            "cap; using the barrier engine.", num_relaxation_batches)
        return False
    if mesh is not None and slots is not None:
        size = mesh.size
        if jax.process_count() > 1:
            # per-process engines run on the local submesh (see
            # ContinuousRelaxationEngine.__init__)
            size = max(1, mesh.local_mesh.size if hasattr(mesh, "local_mesh") else
                       sum(d.process_index == jax.process_index() for d in mesh.devices.flat))
        if slots % size != 0:
            return False
    return True


class RelaxedSystem(NamedTuple):
    """Per-system result record (host-side)."""

    sid: int
    fid: int
    energy: float  # final (relaxed) energy
    pos: np.ndarray  # [natoms, 3] final positions
    forces: np.ndarray  # [natoms, 3] final forces (fixed-atom-zeroed)
    nsteps: int  # optimizer iterations executed
    converged: bool  # fmax reached (False = budget exhausted)


class _SlotState(NamedTuple):
    """Device state: B slots, each an independent L-BFGS instance."""

    batch: AtomsBatch  # slot systems; .pos = current positions
    r0: jnp.ndarray  # [B, D] previous positions (flattened per system)
    f0: jnp.ndarray  # [B, D] previous forces
    s_buf: jnp.ndarray  # [M, B, D] per-system position-delta ring buffer
    y_buf: jnp.ndarray  # [M, B, D] per-system gradient-delta ring buffer
    rho: jnp.ndarray  # [M, B] per-system 1/(y.s)
    it: jnp.ndarray  # [B] int32 optimizer iterations done for the occupant
    budget: jnp.ndarray  # [B] int32 per-system step budget
    done: jnp.ndarray  # [B] bool converged or budget-exhausted
    conv: jnp.ndarray  # [B] bool converged (subset of done)
    finalized: jnp.ndarray  # [B] bool final trajectory frame emitted
    cand: object = ()  # Verlet candidate tables (pytree; () when unused)


def _two_loop_per_system(q, s_buf, y_buf, rho, n_hist, h0):
    """Per-system two-loop recursion: block-diagonal version of
    lbfgs.two_loop (same math per system; dots reduce over each system's own
    coordinates instead of the flattened batch)."""
    m = s_buf.shape[0]

    def bwd(j, qa):
        q, alpha = qa
        slot = m - 1 - j  # newest -> oldest
        valid = j < n_hist  # [B]
        a = rho[slot] * jnp.sum(s_buf[slot] * q, axis=-1)  # [B]
        a = jnp.where(valid, a, 0.0)
        q = q - a[:, None] * y_buf[slot]
        return q, alpha.at[slot].set(a)

    q, alpha = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros((m, q.shape[0]), q.dtype)))
    z = h0 * q

    def fwd(slot, z):
        valid = slot >= m - n_hist  # [B]
        beta = rho[slot] * jnp.sum(y_buf[slot] * z, axis=-1)
        upd = s_buf[slot] * (alpha[slot] - beta)[:, None]
        return z + jnp.where(valid[:, None], upd, 0.0)

    return jax.lax.fori_loop(0, m, fwd, z)


def _refresh_candidates(candidate_fn, batch: AtomsBatch, cand):
    """Verlet-list maintenance (see lbfgs.lbfgs_relax / ops/pbc.py
    CandidateTable): lax.cond full rebuild once the displacement margin is
    spent.  After a slot refill the new occupant's displacement vs the stale
    ``pos0`` trips the margin, but the engine rebuilds eagerly at refill time
    anyway (see ``ContinuousRelaxationEngine._refill_slots``) so the margin
    logic never sees a mixed-occupant table."""
    from adsorbdiff_tpu.ops.pbc import CandidateTable

    leaves = jax.tree.leaves(cand, is_leaf=lambda x: isinstance(x, CandidateTable))
    tables = [t for t in leaves if isinstance(t, CandidateTable)]
    need = jnp.asarray(False)
    for t in tables:
        d2 = jnp.sum((batch.pos - t.pos0) ** 2, axis=-1)  # [B, N]
        disp = jnp.sqrt(masked_max(d2, batch.atom_mask, axis=1))  # [B]
        need |= jnp.any(4.0 * disp >= t.margin)
    return jax.lax.cond(
        need, lambda b: candidate_fn(b), lambda b: cand, batch
    )


def _make_chunk_fn(
    energy_forces_fn,
    candidate_fn,
    *,
    chunk_steps: int,
    fmax: float,
    maxstep: float,
    memory: int,
    damping: float,
    alpha: float,
):
    """One jitted dispatch = ``chunk_steps`` per-system L-BFGS steps.

    Per-step math mirrors lbfgs.lbfgs_relax step-for-step (push gating, tiny-
    step skip, per-system maxstep clamp, freeze-on-convergence), with every
    batch-level mask replaced by its per-system counterpart."""
    h0 = 1.0 / float(alpha)

    def step(state: _SlotState, _):
        batch = state.batch
        b, n, _ = batch.pos.shape
        d = n * 3
        atom3 = batch.atom_mask[..., None]
        cand = state.cand
        if candidate_fn is not None:
            cand = _refresh_candidates(candidate_fn, batch, cand)
            energy, forces = energy_forces_fn(batch, cand)
        else:
            energy, forces = energy_forces_fn(batch)
        forces = jnp.where(atom3, forces, 0.0)

        fnorm = jnp.linalg.norm(forces, axis=-1)  # [B, N]
        max_f = masked_max(fnorm, batch.atom_mask, axis=1)  # [B]
        active = jnp.logical_not(state.done)
        # emit: active systems, plus one extra frame for freshly-done systems
        # (the final relaxed state, recomputed — mirrors lbfgs_relax's
        # appended final frame / the reference's finalization forward)
        emit = active | (state.done & jnp.logical_not(state.finalized))
        finalized = state.finalized | state.done
        now_conv = active & (max_f < fmax)

        r = batch.pos.reshape(b, d)
        f = forces.reshape(b, d)

        # per-system history push (ref :170-177 semantics, per system)
        s0 = r - state.r0
        y0 = -(f - state.f0)
        rho0 = 1.0 / jnp.sum(y0 * s0, axis=-1)  # [B]
        has_hist = (state.it > 0) & active
        hh = has_hist[None, :, None]
        s_buf = jnp.where(hh, jnp.roll(state.s_buf, -1, axis=0).at[-1].set(s0), state.s_buf)
        y_buf = jnp.where(hh, jnp.roll(state.y_buf, -1, axis=0).at[-1].set(y0), state.y_buf)
        rho = jnp.where(has_hist[None, :], jnp.roll(state.rho, -1, axis=0).at[-1].set(rho0), state.rho)
        n_hist = jnp.minimum(state.it, memory).astype(jnp.int32)

        z = _two_loop_per_system(-f, s_buf, y_buf, rho, n_hist, h0)
        p = (-z).reshape(b, n, 3)

        # per-system maxstep clamp (ref determine_step :151-162)
        steplen = jnp.linalg.norm(p, axis=-1)
        longest = masked_max(steplen, batch.atom_mask, axis=1)
        scale = jnp.minimum(longest, maxstep) / (longest + 1e-7)
        dr = p * scale[:, None, None] * damping
        tiny = jnp.max(jnp.abs(dr), axis=(1, 2)) < 1e-7  # ref :195-197, per system

        move = (active & jnp.logical_not(now_conv) & jnp.logical_not(tiny))[:, None, None] & atom3
        new_pos = jnp.where(move, batch.pos + dr, batch.pos)

        it_new = state.it + active.astype(jnp.int32)
        hit_budget = active & jnp.logical_not(now_conv) & (it_new >= state.budget)
        keep = (active & jnp.logical_not(tiny))[:, None]

        new_state = _SlotState(
            batch=batch.replace(pos=new_pos),
            r0=jnp.where(keep, r, state.r0),
            f0=jnp.where(keep, f, state.f0),
            s_buf=s_buf,
            y_buf=y_buf,
            rho=rho,
            it=it_new,
            budget=state.budget,
            done=state.done | now_conv | hit_budget,
            conv=state.conv | now_conv,
            finalized=finalized,
            cand=cand,
        )
        return new_state, (batch.pos, energy, forces, emit)

    def chunk(state: _SlotState):
        state, (tp, te, tf, emit) = jax.lax.scan(step, state, None, length=chunk_steps)
        return state, tp, te, tf, emit

    return jax.jit(chunk)


@functools.partial(jax.jit, static_argnames=("n_pad_rows",))
def _gather_slots(state: _SlotState, idx: jnp.ndarray, n_pad_rows: int) -> _SlotState:
    """Narrow the slot axis to ``idx`` (drain-phase batch narrowing).

    Per-system history makes slot state gatherable: row ``idx[j]`` of every
    per-slot array — including the ring buffers — IS system j's complete
    optimizer state.  The last ``n_pad_rows`` entries of ``idx`` are padding
    (duplicates of a live row); they are marked done+finalized so they never
    emit frames or retire.  Candidate tables are dropped — the caller rebuilds
    them for the narrowed batch."""

    def take(axis):
        return lambda a: jnp.take(a, idx, axis=axis)

    b_new = idx.shape[0]
    pad = jnp.arange(b_new) >= (b_new - n_pad_rows)
    return _SlotState(
        batch=jax.tree.map(take(0), state.batch),
        r0=take(0)(state.r0),
        f0=take(0)(state.f0),
        s_buf=take(1)(state.s_buf),
        y_buf=take(1)(state.y_buf),
        rho=take(1)(state.rho),
        it=take(0)(state.it),
        budget=take(0)(state.budget),
        done=take(0)(state.done) | pad,
        conv=take(0)(state.conv) & jnp.logical_not(pad),
        finalized=take(0)(state.finalized) | pad,
        cand=(),
    )


def _remap_buffers(buffers: Dict[int, list], mapping: Dict[int, int]) -> None:
    """Writer-thread task: renumber per-slot frame accumulators after a
    narrow (old slot -> new slot).  Pop-all-then-set handles overlapping
    old/new indices."""
    moved = {old: buffers.pop(old) for old in list(mapping) if old in buffers}
    for old, new in mapping.items():
        if old in moved:
            buffers[new] = moved[old]


@jax.jit
def _refill(state: _SlotState, slot: jnp.ndarray, row: AtomsBatch, budget: jnp.ndarray) -> _SlotState:
    """Replace slot ``slot`` with a fresh system: its batch row, a zeroed
    history, it=0.  ``row`` leaves are [1, ...]; ``slot`` is traced (one
    compile covers every slot index)."""

    def upd(axis):
        return lambda a, r: jax.lax.dynamic_update_slice_in_dim(a, r.astype(a.dtype), slot, axis=axis)

    m, b, d = state.s_buf.shape
    zrow = jnp.zeros((1, d), state.r0.dtype)
    return _SlotState(
        batch=jax.tree.map(upd(0), state.batch, row),
        r0=upd(0)(state.r0, zrow),
        f0=upd(0)(state.f0, zrow),
        s_buf=upd(1)(state.s_buf, jnp.zeros((m, 1, d), state.s_buf.dtype)),
        y_buf=upd(1)(state.y_buf, jnp.zeros((m, 1, d), state.y_buf.dtype)),
        rho=upd(1)(state.rho, jnp.zeros((m, 1), state.rho.dtype)),
        it=upd(0)(state.it, jnp.zeros((1,), jnp.int32)),
        budget=upd(0)(state.budget, budget[None]),
        done=upd(0)(state.done, jnp.zeros((1,), bool)),
        conv=upd(0)(state.conv, jnp.zeros((1,), bool)),
        finalized=upd(0)(state.finalized, jnp.zeros((1,), bool)),
        cand=state.cand,  # stale for this slot; caller rebuilds eagerly
    )


def _collect_chunk(
    arrays: Tuple,  # (traj_pos, traj_e, traj_f, emit) device arrays [R, B, ...]
    occupied: List[int],
    retire: List[dict],
    buffers: Dict[int, list],
    results: Dict[int, RelaxedSystem],
    traj_dir: Optional[str],
    save_full: bool,
) -> None:
    """Writer-thread task: device->host readback, per-slot frame accumulation,
    trajectory writes for retiring systems.  ``buffers``/``results`` are
    mutated ONLY on the writer thread (tasks are FIFO, so a retiring slot's
    buffer is popped before the next occupant's frames arrive).

    When full trajectories are not needed (``traj_dir is None`` or
    ``save_full=False``) only each retiree's FINAL frame leaves the device —
    a retiring occupant's final frame is always in the current chunk (retire
    happens at the first boundary where done & finalized) — keeping the
    per-chunk device->host traffic to the emit mask plus a few rows."""
    dtp, dte, dtf, dem = arrays
    em = np.asarray(dem)
    full = traj_dir is not None and save_full
    if full:
        tp, te, tf = np.asarray(dtp), np.asarray(dte), np.asarray(dtf)
        for b in occupied:
            rows = np.nonzero(em[:, b])[0]
            if rows.size:
                buffers.setdefault(b, []).append((tp[rows, b], te[rows, b], tf[rows, b]))
    for rec in retire:
        b = rec["slot"]
        sys: System = rec["system"]
        n = sys.natoms
        if full:
            chunks = buffers.pop(b, [])
            pos = np.concatenate([c[0] for c in chunks], axis=0)
            e = np.concatenate([c[1] for c in chunks], axis=0)
            f = np.concatenate([c[2] for c in chunks], axis=0)
        else:
            last = int(np.nonzero(em[:, b])[0][-1])  # final frame, this chunk
            pos = np.asarray(dtp[last, b])[None]
            e = np.asarray(dte[last, b])[None]
            f = np.asarray(dtf[last, b])[None]
        results[sys.sid] = RelaxedSystem(
            sid=sys.sid,
            fid=sys.fid,
            energy=float(e[-1]),
            pos=pos[-1, :n].copy(),
            forces=f[-1, :n].copy(),
            nsteps=rec["nsteps"],
            converged=rec["converged"],
        )
        if traj_dir is not None:
            frames = slice(None) if save_full else slice(-1, None)
            Trajectory(
                positions=pos[frames, :n],
                numbers=sys.atomic_numbers,
                cell=sys.cell,
                tags=sys.tags,
                fixed=sys.fixed,
                energy=e[frames],
                forces=f[frames, :n],
                sid=sys.sid,
                fid=sys.fid,
            ).save(os.path.join(traj_dir, str(sys.sid)))


class ContinuousRelaxationEngine:
    """Slot-refill batched L-BFGS over a stream of systems.

    Drop-in alternative to :class:`RelaxationEngine` for throughput-bound
    relaxation sweeps; selected by ``relax_opt: {continuous: true}`` (see
    pipeline.run_pipeline / trainer.run_relaxations).  All systems in one
    ``run_systems`` call share a pad shape; :meth:`run_dataset` buckets by
    atom count first.  ``mesh``: optional ``jax.sharding.Mesh`` — the slot
    axis dp-shards over it (slots must be a multiple of the mesh size).  On
    multi-HOST runs the engine goes process-local: the mesh is reduced to
    this process's devices and ``run_systems`` keeps only this process's
    round-robin shard of the stream (refill stays host-local; callers gather
    by sid and already tolerate shard-partial result dicts).
    """

    def __init__(
        self,
        energy_forces_fn,
        relax_opt: Optional[dict] = None,
        steps: int = 300,
        fmax: float = 0.01,
        candidate_fn: Optional[Callable] = None,
        slots: int = 8,
        chunk_steps: int = 32,
        mesh=None,
    ) -> None:
        opt = dict(relax_opt or {})
        self.steps = int(opt.get("steps", steps))
        self.fmax = float(opt.get("fmax", fmax))
        self.slots = int(opt.get("slots", slots))
        self.chunk_steps = int(opt.get("chunk_steps", chunk_steps))
        self.kwargs = dict(
            fmax=self.fmax,
            maxstep=float(opt.get("maxstep", 0.04)),
            memory=int(opt.get("memory", 50)),
            damping=float(opt.get("damping", 1.0)),
            alpha=float(opt.get("alpha", 70.0)),
        )
        self.energy_forces_fn = energy_forces_fn
        self.candidate_fn = candidate_fn
        self.mesh = mesh
        # drain narrowing: once the pool is empty and at most half the slots
        # are live, gather the survivors into a power-of-two batch (each
        # narrowed width compiles once; the persistent compilation cache
        # makes that a one-time cost).  Off by default; not with a mesh.
        self.drain_narrowing = bool(opt.get("drain_narrowing", False))
        self.narrow_events: list = []  # (live, new_width) — introspection
        self._chunk_fns: Dict[Tuple[int, int], Callable] = {}
        self._writer = _AsyncWriter()
        if jax.process_count() > 1:
            # Multi-host: systems are independent and slot refill is
            # host-local, so each process runs its own engine over its
            # round-robin shard of the stream (run_systems) on a
            # PROCESS-LOCAL mesh — no cross-host refill protocol, no
            # collectives (docs/MULTICHIP.md).  Ref semantics being beaten:
            # the reference's single shared-batch L-BFGS, lbfgs_torch.py:92-143.
            if mesh is not None:
                import numpy as _np
                from jax.sharding import Mesh

                local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
                if len(local) != mesh.devices.size:
                    name = mesh.axis_names[0] if len(mesh.axis_names) == 1 else "dp"
                    mesh = Mesh(_np.asarray(local), (name,)) if local else None
        self.mesh = mesh
        if mesh is not None and self.slots % mesh.size != 0:
            raise ValueError(f"slots ({self.slots}) must be a multiple of the mesh size ({mesh.size})")

    @classmethod
    def from_model(cls, model, variables, relax_opt: Optional[dict] = None, **kw) -> "ContinuousRelaxationEngine":
        from adsorbdiff_tpu.relaxation.lbfgs import make_mlff_energy_forces

        opt = dict(relax_opt or {})
        candidate_fn = None
        if bool(opt.get("verlet_graph", True)) and hasattr(model, "prepare_candidates"):
            k_cand = int(opt.get("k_cand", 64))
            candidate_fn = lambda b: model.prepare_candidates(b, k_cand)  # noqa: E731
        return cls(make_mlff_energy_forces(model, variables), relax_opt, candidate_fn=candidate_fn, **kw)

    def flush(self) -> None:
        """Join pending async trajectory writes (call before reading them)."""
        self._writer.flush()

    def _chunk_fn(self, b: int, n: int):
        key = (b, n)
        if key not in self._chunk_fns:
            self._chunk_fns[key] = _make_chunk_fn(
                self.energy_forces_fn,
                self.candidate_fn,
                chunk_steps=self.chunk_steps,
                **self.kwargs,
            )
        return self._chunk_fns[key]

    def _init_state(self, batch: AtomsBatch, budgets: np.ndarray) -> _SlotState:
        b, n, _ = batch.pos.shape
        d = n * 3
        m = self.kwargs["memory"]
        dt = batch.pos.dtype
        return _SlotState(
            batch=batch,
            r0=jnp.zeros((b, d), dt),
            f0=jnp.zeros((b, d), dt),
            s_buf=jnp.zeros((m, b, d), dt),
            y_buf=jnp.zeros((m, b, d), dt),
            rho=jnp.zeros((m, b), dt),
            it=jnp.zeros(b, jnp.int32),
            budget=jnp.asarray(budgets, jnp.int32),
            done=jnp.zeros(b, bool),
            conv=jnp.zeros(b, bool),
            finalized=jnp.zeros(b, bool),
            cand=self.candidate_fn(batch) if self.candidate_fn is not None else (),
        )

    def _shard_state(self, state: _SlotState) -> _SlotState:
        """dp-shard every per-slot axis over the mesh (slot axis is leading
        everywhere except the ring buffers, where it is axis 1)."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x, axis):
            spec = [None] * x.ndim
            spec[axis] = "dp"
            return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

        return _SlotState(
            batch=jax.tree.map(lambda x: put(x, 0), state.batch),
            r0=put(state.r0, 0),
            f0=put(state.f0, 0),
            s_buf=put(state.s_buf, 1),
            y_buf=put(state.y_buf, 1),
            rho=put(state.rho, 1),
            it=put(state.it, 0),
            budget=put(state.budget, 0),
            done=put(state.done, 0),
            conv=put(state.conv, 0),
            finalized=put(state.finalized, 0),
            cand=jax.tree.map(lambda x: put(x, 0) if x.ndim >= 1 else x, state.cand),
        )

    def run_systems(
        self,
        systems: Sequence[System],
        traj_dir: Optional[str] = None,
        save_full_traj: bool = True,
        skip_existing: bool = True,
        budgets: Optional[Sequence[int]] = None,
        max_atoms: Optional[int] = None,
    ) -> Dict[int, RelaxedSystem]:
        """Relax ``systems`` (each at most ``self.steps`` optimizer steps, or
        its entry in ``budgets``); returns {sid: RelaxedSystem} for every
        system processed this call (skipped ones excluded)."""
        systems = list(systems)
        budgets = [self.steps] * len(systems) if budgets is None else [int(x) for x in budgets]
        if len(budgets) != len(systems):
            raise ValueError("budgets must align with systems")
        if jax.process_count() > 1:
            # deterministic round-robin shard: every process enumerates the
            # same full list, keeps its own residue class, and returns only
            # its own results (callers already tolerate missing sids)
            pc, pi = jax.process_count(), jax.process_index()
            keep_idx = range(pi, len(systems), pc)
            systems = [systems[i] for i in keep_idx]
            budgets = [budgets[i] for i in keep_idx]
            if not systems:
                return {}
        if traj_dir is not None:
            os.makedirs(traj_dir, exist_ok=True)
        if skip_existing and traj_dir is not None:
            kept = [
                (s, bd)
                for s, bd in zip(systems, budgets)
                if not (self._writer.is_pending((traj_dir, s.sid)) or check_traj_files([s.sid], traj_dir))
            ]
            nskip = len(systems) - len(kept)
            if nskip:
                logging.info(f"Skipping {nskip} systems with existing trajectories")
            systems, budgets = [s for s, _ in kept], [b for _, b in kept]
        results: Dict[int, RelaxedSystem] = {}
        if not systems:
            return results
        n_pad = max(s.natoms for s in systems) if max_atoms is None else int(max_atoms)
        b = self.slots
        chunk_fn = self._chunk_fn(b, n_pad)

        pool = list(zip(systems, budgets))[::-1]  # pop() preserves order
        occupants: Dict[int, Optional[System]] = {}
        first = [pool.pop() if pool else None for _ in range(b)]
        filler = first[0][0]  # at least one system exists
        init_systems, init_budgets, inactive = [], [], []
        for i, entry in enumerate(first):
            if entry is None:  # fewer systems than slots: dead filler rows
                init_systems.append(filler)
                init_budgets.append(0)
                inactive.append(i)
                occupants[i] = None
            else:
                init_systems.append(entry[0])
                init_budgets.append(entry[1])
                occupants[i] = entry[0]
        state = self._shard_state(
            self._init_state(collate(init_systems, max_atoms=n_pad), np.asarray(init_budgets, np.int32))
        )
        if inactive:
            dead = jnp.zeros(b, bool).at[jnp.asarray(inactive)].set(True)
            state = state._replace(done=dead, finalized=dead)
        buffers: Dict[int, list] = {}  # writer-thread-owned frame accumulators

        debug = os.environ.get("ADSORBDIFF_CONT_DEBUG", "0") != "0"
        while True:
            t_dispatch = time.perf_counter()
            state, tp, te, tf, emit = chunk_fn(state)
            # ONE packed readback per chunk (each device_get pays a full
            # round trip on remote-device runtimes)
            packed = jnp.concatenate([
                (state.done & state.finalized).astype(jnp.int32),
                state.it,
                state.conv.astype(jnp.int32),
            ])
            t_enq = time.perf_counter()
            flags = np.asarray(jax.device_get(packed)).reshape(3, b)
            t_read = time.perf_counter()
            retirable, its, convs = flags[0].astype(bool), flags[1], flags[2].astype(bool)
            retire = []
            for i in range(b):
                if occupants[i] is not None and retirable[i]:
                    retire.append(
                        {
                            "slot": i,
                            "system": occupants[i],
                            "nsteps": int(its[i]),
                            "converged": bool(convs[i]),
                        }
                    )
                    occupants[i] = None
            keys = [(traj_dir, r["system"].sid) for r in retire if traj_dir is not None]
            self._writer.submit(
                _collect_chunk,
                (tp, te, tf, emit),
                [i for i in range(b) if occupants[i] is not None or any(r["slot"] == i for r in retire)],
                retire,
                buffers,
                results,
                traj_dir,
                save_full_traj,
                pending_keys=keys,
            )
            refilled = False
            for r in retire:
                if not pool:
                    break
                sys_, bd = pool.pop()
                i = r["slot"]
                row = collate([sys_], max_atoms=n_pad)
                state = _refill(state, jnp.asarray(i, jnp.int32), row, jnp.asarray(bd, jnp.int32))
                occupants[i] = sys_
                refilled = True
            if refilled and self.candidate_fn is not None:
                # eager rebuild: refilled slots' candidate tables are stale
                # (built for the previous occupant); rebuilding here keeps the
                # margin invariant exact for every occupant
                state = state._replace(cand=self.candidate_fn(state.batch))
            if self.drain_narrowing and self.mesh is None and not pool:
                live = [i for i in range(b) if occupants[i] is not None]
                b_new = 1 << max(0, len(live) - 1).bit_length() if live else 0
                if live and b_new <= b // 2:
                    # drain narrowing: gather the survivors into a smaller
                    # batch (forward cost is ~linear in B) — exact, because
                    # per-system history rows move with their system
                    pad_rows = b_new - len(live)
                    idx = live + [live[0]] * pad_rows
                    self._writer.submit(
                        _remap_buffers, buffers, {old: new for new, old in enumerate(live)}
                    )
                    state = _gather_slots(state, jnp.asarray(idx, jnp.int32), pad_rows)
                    if self.candidate_fn is not None:
                        state = state._replace(cand=self.candidate_fn(state.batch))
                    occupants = {new: occupants[old] for new, old in enumerate(live)}
                    occupants.update({j: None for j in range(len(live), b_new)})
                    b = b_new
                    chunk_fn = self._chunk_fn(b, n_pad)
                    self.narrow_events.append((len(live), b_new))
            if debug:
                logging.info(
                    "cont chunk: dispatch %.3fs readback %.3fs retire+refill %.3fs "
                    "(retired %d, pool %d)",
                    t_enq - t_dispatch, t_read - t_enq,
                    time.perf_counter() - t_read, len(retire), len(pool),
                )
            if all(o is None for o in occupants.values()) and not pool:
                break
        self.flush()
        return results

    def run_dataset(
        self,
        dataset,
        traj_dir: Optional[str] = None,
        num_buckets: int = 4,
        **kw,
    ) -> Dict[int, RelaxedSystem]:
        """Relax every system of a dataset (anything with ``__len__`` +
        ``__getitem__ -> System``), bucketed by atom count so pad shapes stay
        tight (same quantile edges as BucketedBatcher)."""
        from adsorbdiff_tpu.data.buckets import default_bucket_edges

        systems = [dataset[i] for i in range(len(dataset))]
        if not systems:
            return {}
        natoms = np.asarray([s.natoms for s in systems])
        edges = default_bucket_edges(natoms, num_buckets)
        results: Dict[int, RelaxedSystem] = {}
        lo = 0
        for hi in edges:
            group = [s for s in systems if lo < s.natoms <= hi]
            lo = hi
            if group:
                results.update(self.run_systems(group, traj_dir=traj_dir, max_atoms=hi, **kw))
        return results
