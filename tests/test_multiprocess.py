"""The multi-HOST process boundary: 2 processes x 4 CPU devices via
jax.distributed (gloo), through parallel/mesh.py.

Replaces the reference's three torch.distributed init paths
(ref: adsorbdiff/utils/distutils.py:25-103) at the semantics level: the same
DenoisingTrainer step and sampling scan must produce the same numbers whether
the 8-device dp mesh lives in one process or spans two.
"""
import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adsorbdiff_tpu.diffusion.sampler import reverse_diffusion
from adsorbdiff_tpu.parallel import mesh as meshlib
from tests.test_mesh_scaling import _make_trainer
from tests.test_painn import make_batch

RESULT_RE = re.compile(
    r"RESULT pid=(\d) loss=([-\d.e]+) sample_stat=([-\d.e]+)(?: wrote=([\d,]*))?(?: cont=(\S*))?"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same computation as tests/mp_worker.py on the in-suite 8-device mesh."""
    mesh = meshlib.make_mesh(8)
    trainer = _make_trainer(8, mesh)
    batch = make_batch(np.random.default_rng(3), b=8)
    trainer.init_state(batch)
    host_state = jax.tree.map(np.asarray, trainer.state)
    trainer.state = meshlib.shard_tree(
        host_state, jax.tree.map(lambda _: meshlib.replicated(mesh), host_state)
    )
    sharded = meshlib.shard_batch(batch, mesh)
    step = trainer._get_step_fn(sharded)
    state, aux = step(trainer.state, sharded, jax.random.PRNGKey(7))
    loss = float(jax.device_get(aux["loss"]))
    trainer.state = state

    params = dict(num_steps=8, ads_std_low=0.1, ads_std_high=10.0,
                  rot_std_low=0.01, rot_std_high=1.55, ode=True)

    def sample_stat(b, k):
        pos = reverse_diffusion(trainer.score_fn, b, params, k).batch.pos
        w = jnp.cos(jnp.arange(pos.size, dtype=jnp.float32).reshape(pos.shape))
        return jnp.sum(pos * w)

    stat = float(jax.device_get(jax.jit(sample_stat)(sharded, jax.random.PRNGKey(11))))
    return loss, stat


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, "/root/.axon_site", env.get("PYTHONPATH", "")] if p
    )
    env["MP_TRAJ_DIR"] = str(tmp_path)
    env["MP_CONT_DIR"] = str(tmp_path / "cont")
    # workers set their own JAX_PLATFORMS/XLA_FLAGS before importing jax
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.mp_worker", str(pid), "2", str(port)],
            cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    results, wrote = {}, {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        m = RESULT_RE.search(out)
        assert m, out[-3000:]
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
        wrote[int(m.group(1))] = {int(s) for s in (m.group(4) or "").split(",") if s}
    assert set(results) == {0, 1}
    # both controllers must agree exactly (same global program)
    assert results[0] == results[1]

    # engine-path trajectory writes: each host wrote exactly the dp rows it
    # owns — disjoint, exhaustive, and readable (multi-host _write_trajs path)
    assert wrote[0] and wrote[1]
    assert wrote[0].isdisjoint(wrote[1])
    assert wrote[0] | wrote[1] == set(range(8))
    from adsorbdiff_tpu.runtime.trajectory import Trajectory

    for pid, sids in wrote.items():
        for sid in sids:
            traj = Trajectory.load(str(tmp_path / f"pid{pid}" / str(sid)))
            assert traj.positions.shape[1:] == (20, 3)
            assert np.isfinite(traj.positions).all()

    # continuous engine: per-process shards are disjoint + exhaustive, and
    # every system's relaxation is bit-identical to the single-process engine
    cont = {}
    for out, p in zip(outs, procs):
        m = RESULT_RE.search(out)
        pid = int(m.group(1))
        cont[pid] = {}
        for entry in (m.group(5) or "").split(";"):
            if entry:
                sid, pos_sum, nsteps, conv = entry.split(":")
                cont[pid][int(sid)] = (float(pos_sum), int(nsteps), int(conv))
    assert cont[0] and cont[1]
    assert set(cont[0]).isdisjoint(cont[1])
    assert set(cont[0]) | set(cont[1]) == set(range(100, 110))
    from adsorbdiff_tpu.relaxation.continuous import ContinuousRelaxationEngine
    from tests.test_continuous import KW, harmonic_by_sid, make_systems

    rng2 = np.random.default_rng(5)
    systems, targets, ks = make_systems(rng2, count=10)
    fn = harmonic_by_sid(targets, ks, 6)
    eng = ContinuousRelaxationEngine(fn, {**KW, "chunk_steps": 8}, steps=80, slots=4)
    ref = eng.run_systems(systems, max_atoms=6, skip_existing=False)
    merged = {**cont[0], **cont[1]}
    for sid, r in ref.items():
        got = merged[sid]
        assert got[0] == pytest.approx(float(np.sum(r.pos)), abs=2e-6)
        assert got[1] == r.nsteps and got[2] == int(r.converged)
    # each host wrote trajectories only for its own shard
    for pid in (0, 1):
        import glob as _glob

        files = {int(os.path.basename(f).split(".")[0])
                 for f in _glob.glob(str(tmp_path / "cont" / f"pid{pid}" / "*"))}
        assert files == set(cont[pid])

    ref_loss, ref_stat = _single_process_reference()
    # single- vs multi-process GSPMD re-association noise only
    assert results[0][0] == pytest.approx(ref_loss, rel=1e-5)
    assert results[0][1] == pytest.approx(ref_stat, rel=1e-4, abs=1e-3)
