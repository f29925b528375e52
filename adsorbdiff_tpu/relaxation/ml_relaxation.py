"""Batch drivers: diffusion sampling and MLFF relaxation over a dataset.

Rebuild of ``ml_relax`` / ``ml_diffuse`` (ref: adsorbdiff/relaxation/
ml_relaxation.py:23-168).  The reference maintains a deque of batches with
CUDA-OOM bisection-retry; with static padded shapes memory is known at compile
time, so the drivers are straight loops: jit-compile once per bucket shape,
one device dispatch per batch, trajectory writes drained on a background
thread so host IO overlaps the next batch's device work (call
``engine.flush()`` before reading the trajectory directory).  Per-system
trajectory files are named ``<sid>.adtraj.npz`` and skipped when already
present or queued (resumability, ref: sde_denoising_trainer.py:793-800).
"""
from __future__ import annotations

import logging
import os
import queue
import threading
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adsorbdiff_tpu.data.schema import AtomsBatch
from adsorbdiff_tpu.diffusion.sampler import SampleResult, langevin_dynamics, reverse_diffusion
from adsorbdiff_tpu.relaxation.lbfgs import LBFGSResult, lbfgs_relax, make_mlff_energy_forces
from adsorbdiff_tpu.runtime.trajectory import SUFFIX, Trajectory, check_traj_files


class _AsyncWriter:
    """Single background thread that drains trajectory writes so the host IO
    (~70 ms/system for full relax trajectories) overlaps the next batch's
    device dispatch.  Writes stay ordered; ``flush()`` joins before anything
    reads the trajectory directory.  The reference writes ASE trajs inline on
    the hot loop (ref: lbfgs_torch.py:117-140) — this is free throughput."""

    def __init__(self) -> None:
        self._q: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None
        self._pending: set = set()  # (traj_dir, sid) keys submitted, not yet on disk
        self._lock = threading.Lock()

    def _loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, kwargs, keys = item
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # surfaced at flush()
                self._err = e
            finally:
                with self._lock:
                    self._pending.difference_update(keys)

    def submit(self, fn, *args, pending_keys=(), **kwargs) -> None:
        with self._lock:
            self._pending.update(pending_keys)
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        self._q.put((fn, args, kwargs, frozenset(pending_keys)))

    def is_pending(self, key) -> bool:
        with self._lock:
            return key in self._pending

    def flush(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            self._q.put(None)
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def _should_skip(writer: _AsyncWriter, batch: AtomsBatch, traj_dir: str) -> bool:
    """Resumability check that treats queued-but-unwritten trajectories as
    present, so ``skip_existing`` stays correct while writes are async."""
    sids = [int(s) for s in np.asarray(batch.sid)]
    missing = [s for s in sids if not writer.is_pending((traj_dir, s))]
    return not missing or check_traj_files(missing, traj_dir)


class _Rows:
    """Per-system-row host view of a possibly multi-host-sharded array.

    Under a global (multi-process) mesh, batches dp-shard the system axis
    across processes and ``np.asarray`` on the full array would raise
    (non-addressable shards).  This reads only the locally addressable rows
    — so each host writes exactly the systems it computed, the multi-host
    analogue of the reference's per-DDP-rank traj writes
    (ref: lbfgs_torch.py:117-140)."""

    def __init__(self, arr, b_axis: int) -> None:
        self.b_axis = b_axis
        if isinstance(arr, np.ndarray) or getattr(arr, "is_fully_addressable", True):
            self.full, self.shards = np.asarray(arr), None
        else:
            self.full = None
            self.shards = {}  # row -> (shard numpy, local row index)
            for sh in arr.addressable_shards:
                data = np.asarray(sh.data)
                sl = sh.index[b_axis]
                start = 0 if sl.start is None else sl.start
                for j in range(data.shape[b_axis]):
                    self.shards[start + j] = (data, j)

    def rows(self, nrows: int):
        return range(nrows) if self.full is not None else sorted(self.shards)

    def __getitem__(self, i: int) -> np.ndarray:
        if self.full is not None:
            return np.take(self.full, i, axis=self.b_axis)
        data, j = self.shards[i]
        return np.take(data, j, axis=self.b_axis)


def _write_trajs(
    batch: AtomsBatch,  # the UNSHARDED batch (host metadata, same everywhere)
    traj_pos,  # [T, B, N, 3]
    traj_dir: str,
    traj_energy=None,  # [T, B]
    traj_forces=None,  # [T, B, N, 3]
    save_full: bool = True,
) -> None:
    os.makedirs(traj_dir, exist_ok=True)
    # device->host transfers happen here so async callers keep them off the
    # dispatch path; on multi-host meshes only the local rows are read
    pos = _Rows(traj_pos, 1)
    energy = None if traj_energy is None else _Rows(traj_energy, 1)
    forces = None if traj_forces is None else _Rows(traj_forces, 1)
    local = set(pos.rows(batch.batch_size))
    natoms = np.asarray(batch.natoms)
    sids = np.asarray(batch.sid)
    written = set()
    for i in range(batch.batch_size):
        sid = int(sids[i])
        if sid in written:  # batch padding repeats the tail system
            continue
        written.add(sid)  # first occurrence claims the sid on EVERY process
        if i not in local:
            continue  # the owning process writes it
        n = int(natoms[i])
        frames = slice(None) if save_full else slice(-1, None)
        Trajectory(
            positions=pos[i][frames, :n],
            numbers=np.asarray(batch.atomic_numbers)[i, :n],
            cell=np.asarray(batch.cell)[i],
            tags=np.asarray(batch.tags)[i, :n],
            fixed=np.asarray(batch.fixed)[i, :n],
            energy=None if energy is None else energy[i][frames],
            forces=None if forces is None else forces[i][frames, :n],
            sid=sid,
            fid=int(np.asarray(batch.fid)[i]),
        ).save(os.path.join(traj_dir, str(sid)))


class DiffusionEngine:
    """Jit-cached reverse-diffusion over batches (the Denoiser + ml_diffuse
    pair, ref: denoising_torch.py:18-84 + ml_relaxation.py:98-168)."""

    def __init__(
        self,
        score_fn,
        denoising_pos_params: dict,
        sampler: str = "reverse_sde_rot",
        static_fn: Optional[Callable] = None,
        mesh=None,
    ) -> None:
        """``static_fn``: optional ``batch -> static-graph`` precomputation
        (e.g. ``model.prepare_static``) hoisted out of the sampling scan; when
        given, ``score_fn`` is called as ``score_fn(batch, static)``.  Only
        adsorbate atoms move during sampling, so the cached slab-slab graph
        rows stay exact (tests/test_pbc.py parity).

        ``mesh``: optional ``jax.sharding.Mesh`` — batches are dp-sharded
        over it before dispatch (systems are independent, so this is exact;
        tests/test_mesh_scaling.py).  Requires batch_size % mesh size == 0;
        BucketedBatcher always yields full batches."""
        self.score_fn = score_fn
        self.params = dict(denoising_pos_params)
        self.sampler = sampler
        self.static_fn = static_fn
        self.mesh = mesh
        self._fns: Dict[Tuple[int, int], Callable] = {}
        self._writer = _AsyncWriter()

    def flush(self) -> None:
        """Join pending async trajectory writes (call before reading them)."""
        self._writer.flush()

    def _fn(self, batch: AtomsBatch):
        key = (batch.batch_size, batch.max_atoms)
        if key not in self._fns:
            if self.sampler == "langevin":
                f = lambda b, k: langevin_dynamics(self.score_fn, b, self.params, k)  # noqa: E731
            else:
                with_rot = "rot_std_low" in self.params
                f = lambda b, k: reverse_diffusion(  # noqa: E731
                    self.score_fn, b, self.params, k, with_rotation=with_rot,
                    static_fn=self.static_fn,
                )
            self._fns[key] = jax.jit(f)
        return self._fns[key]

    def run(
        self,
        batch: AtomsBatch,
        key: jax.Array,
        traj_dir: Optional[str] = None,
        save_full_traj: bool = True,
        skip_existing: bool = True,
    ) -> Optional[SampleResult]:
        if traj_dir and skip_existing and _should_skip(self._writer, batch, traj_dir):
            logging.info(f"Skipping batch: {np.asarray(batch.sid).tolist()}")
            return None
        orig = batch  # host metadata for the traj writer (sharded copies may
        # not be fully addressable on multi-host meshes)
        if self.mesh is not None:
            from adsorbdiff_tpu.parallel.mesh import shard_batch

            batch = shard_batch(batch, self.mesh)
        result: SampleResult = self._fn(batch)(batch, key)
        if traj_dir:
            keys = [(traj_dir, int(s)) for s in np.asarray(orig.sid)]
            self._writer.submit(
                _write_trajs, orig, result.traj_pos, traj_dir,
                save_full=save_full_traj, pending_keys=keys,
            )
        return result


class RelaxationEngine:
    """Jit-cached batched L-BFGS over batches (ml_relax, ref: ml_relaxation.py:23-92)."""

    def __init__(
        self,
        energy_forces_fn,
        relax_opt: Optional[dict] = None,
        steps: int = 300,
        fmax: float = 0.01,
        candidate_fn: Optional[Callable] = None,
        mesh=None,
    ) -> None:
        """``mesh``: optional ``jax.sharding.Mesh`` — batches dp-shard over
        it before dispatch (see DiffusionEngine)."""
        opt = dict(relax_opt or {})
        self.kwargs = dict(
            steps=int(opt.get("steps", steps)),
            fmax=float(opt.get("fmax", fmax)),
            maxstep=float(opt.get("maxstep", 0.04)),
            memory=int(opt.get("memory", 50)),
            damping=float(opt.get("damping", 1.0)),
            alpha=float(opt.get("alpha", 70.0)),
            early_exit=bool(opt.get("early_exit", True)),
        )
        self.energy_forces_fn = energy_forces_fn
        self.candidate_fn = candidate_fn
        self.mesh = mesh
        self._fns: Dict[Tuple[int, int], Callable] = {}
        self._writer = _AsyncWriter()

    def flush(self) -> None:
        """Join pending async trajectory writes (call before reading them)."""
        self._writer.flush()

    @classmethod
    def from_model(cls, model, variables, relax_opt: Optional[dict] = None, **kw) -> "RelaxationEngine":
        """``relax_opt["verlet_graph"]`` (default True) maintains the neighbor
        table as a Verlet candidate list inside the relax loop — exact tables
        at O(N*Kc) per step with lax.cond rebuilds when the displacement
        margin is spent (ops/pbc.py::CandidateTable); ``relax_opt["k_cand"]``
        sizes the candidate pool (default 64)."""
        opt = dict(relax_opt or {})
        candidate_fn = None
        if bool(opt.get("verlet_graph", True)) and hasattr(model, "prepare_candidates"):
            k_cand = int(opt.get("k_cand", 64))
            candidate_fn = lambda b: model.prepare_candidates(b, k_cand)  # noqa: E731
        return cls(make_mlff_energy_forces(model, variables), relax_opt, candidate_fn=candidate_fn, **kw)

    def _fn(self, batch: AtomsBatch):
        key = (batch.batch_size, batch.max_atoms)
        if key not in self._fns:
            self._fns[key] = jax.jit(
                lambda b: lbfgs_relax(
                    self.energy_forces_fn, b, candidate_fn=self.candidate_fn, **self.kwargs
                )
            )
        return self._fns[key]

    def run(
        self,
        batch: AtomsBatch,
        traj_dir: Optional[str] = None,
        save_full_traj: bool = True,
        skip_existing: bool = True,
    ) -> Optional[LBFGSResult]:
        if traj_dir and skip_existing and _should_skip(self._writer, batch, traj_dir):
            logging.info(f"Skipping batch: {np.asarray(batch.sid).tolist()}")
            return None
        orig = batch  # host metadata for the traj writer (see DiffusionEngine)
        if self.mesh is not None:
            from adsorbdiff_tpu.parallel.mesh import shard_batch

            batch = shard_batch(batch, self.mesh)
        result: LBFGSResult = self._fn(batch)(batch)
        if traj_dir:
            keys = [(traj_dir, int(s)) for s in np.asarray(orig.sid)]
            self._writer.submit(
                _write_trajs,
                orig,
                result.traj_pos,
                traj_dir,
                traj_energy=result.traj_energy,
                traj_forces=result.traj_forces,
                save_full=save_full_traj,
                pending_keys=keys,
            )
        return result


def ml_diffuse(batch: AtomsBatch, trainer, denoising_pos_params: dict, key, traj_dir=None, save_full_traj=True):
    """Functional facade matching the reference call site (ml_relaxation.py:98)."""

    def score_fn(cur, static_graph=None):
        out = trainer.sampling_model.apply(
            {"params": trainer.state.ema_params, "scale_factors": trainer.state.scale_factors},
            cur, static_graph,
        )
        out1, out2 = out if isinstance(out, tuple) else (out, None)
        if out2 is not None:
            out2 = jnp.where(cur.fixed[..., None], 0.0, out2)
        return out1, out2

    static_fn = trainer.sampling_static_fn() if hasattr(trainer, "sampling_static_fn") else None
    engine = DiffusionEngine(score_fn, denoising_pos_params, static_fn=static_fn,
                             mesh=getattr(trainer, "mesh", None))
    res = engine.run(batch, key, traj_dir=traj_dir, save_full_traj=save_full_traj)
    engine.flush()
    return None if res is None else res.batch


def ml_relax(batch: AtomsBatch, model, variables, relax_opt=None, steps=300, fmax=0.01, traj_dir=None, save_full_traj=True, mesh=None):
    """Functional facade matching the reference call site (ml_relaxation.py:23)."""
    engine = RelaxationEngine.from_model(model, variables, relax_opt, steps=steps, fmax=fmax, mesh=mesh)
    res = engine.run(batch, traj_dir=traj_dir, save_full_traj=save_full_traj)
    engine.flush()
    if res is None:
        return None
    return res.batch.replace(energy=res.energy, forces=res.forces)
