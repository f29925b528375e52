"""Worker for tests/test_multiprocess.py: one member of a 2-process x
4-CPU-device cluster (gloo collectives through jax.distributed).

Runs the SAME tiny-PaiNN DenoisingTrainer step + sampling scan as the
single-process reference and prints replicated scalars for parity checks.
Usage: python -m tests.mp_worker <process_id> <num_processes> <port>
"""
import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("ADSORBDIFF_TPU_CACHE", os.path.join(os.path.dirname(__file__), "..", ".cache"))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from adsorbdiff_tpu.parallel import mesh as meshlib

    # the process boundary under test: distutils.py:25-103 replacement
    meshlib.init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.device_count() == nproc * 4, jax.devices()
    assert jax.local_device_count() == 4
    assert meshlib.process_index() == pid
    assert meshlib.is_master() == (pid == 0)

    import jax.numpy as jnp
    import numpy as np

    from adsorbdiff_tpu.diffusion.sampler import reverse_diffusion
    from tests.test_mesh_scaling import _make_trainer
    from tests.test_painn import make_batch

    mesh = meshlib.make_mesh()  # spans both processes
    trainer = _make_trainer(8, mesh)
    batch = make_batch(np.random.default_rng(3), b=8)
    trainer.init_state(batch)
    # model.init left the state on local device 0; lift it to host values and
    # re-place as a globally-replicated tree (identical on every process by
    # construction: same seed, same example batch)
    host_state = jax.tree.map(np.asarray, trainer.state)
    trainer.state = meshlib.shard_tree(host_state, jax.tree.map(lambda _: meshlib.replicated(mesh), host_state))

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
        return jnp.sum(pos * w)  # order-sensitive replicated checksum

    stat = jax.jit(sample_stat)(sharded, jax.random.PRNGKey(11))
    stat = float(jax.device_get(stat))

    # production engine path over the global mesh: dp-sharded dispatch +
    # per-process trajectory writes (each host writes only the rows it owns,
    # the multi-host analogue of the reference's per-DDP-rank traj files,
    # ref: lbfgs_torch.py:117-140).  Each process gets its OWN directory so
    # the parent test can assert sid ownership is disjoint and exhaustive.
    traj_dir = os.environ.get("MP_TRAJ_DIR")
    wrote_str = ""
    if traj_dir:
        import glob

        from adsorbdiff_tpu.relaxation.ml_relaxation import DiffusionEngine

        my_dir = os.path.join(traj_dir, f"pid{pid}")
        engine = DiffusionEngine(trainer.score_fn, params, mesh=mesh)
        engine.run(batch, jax.random.PRNGKey(11), traj_dir=my_dir, skip_existing=False)
        engine.flush()
        wrote = sorted(
            int(os.path.basename(f).split(".")[0])
            for f in glob.glob(os.path.join(my_dir, "*"))
        )
        wrote_str = " wrote=" + ",".join(map(str, wrote))
    # multi-host continuous relaxation engine: the mesh spans both
    # processes; the engine reduces it to this host's devices and keeps only
    # this host's round-robin shard of the stream (continuous.py) — the
    # parent test asserts the shards are disjoint/exhaustive and every
    # trajectory is bit-identical to the single-process engine
    cont_dir = os.environ.get("MP_CONT_DIR")
    cont_str = ""
    if cont_dir:
        from adsorbdiff_tpu.relaxation.continuous import ContinuousRelaxationEngine
        from tests.test_continuous import KW, harmonic_by_sid, make_systems

        rng2 = np.random.default_rng(5)
        systems, targets, ks = make_systems(rng2, count=10)
        fn = harmonic_by_sid(targets, ks, 6)
        eng = ContinuousRelaxationEngine(
            fn, {**KW, "chunk_steps": 8}, steps=80, slots=4, mesh=mesh
        )
        assert eng.mesh is not None and eng.mesh.size == 4  # process-local
        res = eng.run_systems(
            systems, traj_dir=os.path.join(cont_dir, f"pid{pid}"),
            max_atoms=6, skip_existing=False,
        )
        eng.flush()
        cont_str = " cont=" + ";".join(
            f"{sid}:{float(np.sum(r.pos)):.6f}:{r.nsteps}:{int(r.converged)}"
            for sid, r in sorted(res.items())
        )
    print(f"RESULT pid={pid} loss={loss:.10f} sample_stat={stat:.6f}{wrote_str}{cont_str}", flush=True)


if __name__ == "__main__":
    main()
