"""Worker process for tests/test_distributed.py.

Usage: python tests/distributed_worker.py <coordinator> <num_procs> <pid>

Run with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<M> in the environment:
each of the N processes contributes M virtual CPU devices to one global
mesh, standing in for N TPU hosts (SURVEY §2.6 distributed-backend row).
"""

import sys

import numpy as np


def main() -> int:
    coord, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    # join the global runtime BEFORE any import that might touch the XLA
    # backend (sfm_tpu's import tree warms modules; jax.distributed must
    # come first — same ordering a real multi-host launcher uses)
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n_procs, process_id=pid)

    from sfm_tpu.parallel import distributed as dist
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == n_procs, jax.process_count()
    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == n_procs * n_local, (n_global, n_local)
    print(f"[w{pid}] devices global={n_global} local={n_local}", flush=True)

    mesh = dist.global_mesh(hyp_axis=2)
    n_scene = mesh.shape["scene"]

    # 1. cross-process collective: sum of scene-axis indices
    @jax.jit
    def idx_sum():
        def f():
            i = jax.lax.axis_index("scene").astype(jnp.int32)
            return jax.lax.psum(i, "scene")

        return shard_map(f, mesh=mesh, in_specs=(), out_specs=P())()

    got = int(idx_sum())
    want = n_scene * (n_scene - 1) // 2
    assert got == want, (got, want)
    print(f"[w{pid}] psum over scene axis ok ({got})", flush=True)

    # 2. scene-sharded two-view stage across processes: S scenes of
    # synthetic correspondences from known relative poses; each device
    # solves its scene shard, inlier counts all-reduce over the mesh
    from sfm_tpu.ops import epipolar, lie

    rng = np.random.default_rng(0)  # identical on every process
    S, N = n_scene, 256
    xi = np.zeros((S, N, 2), np.float64)
    xj = np.zeros((S, N, 2), np.float64)
    for s in range(S):
        w = rng.standard_normal(3) * 0.1
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        t = rng.standard_normal(3)
        t /= np.linalg.norm(t)
        X = rng.uniform([-1, -1, 4], [1, 1, 8], (N, 3))
        xi[s] = X[:, :2] / X[:, 2:3]
        Xc = X @ R.T + 0.2 * t
        xj[s] = Xc[:, :2] / Xc[:, 2:3]
    valid = np.ones((S, N), bool)
    keys = np.asarray(
        jax.random.split(jax.random.PRNGKey(7), S), dtype=np.uint32)

    xi_g = dist.scene_shard(mesh, xi)
    xj_g = dist.scene_shard(mesh, xj)
    va_g = dist.scene_shard(mesh, valid)
    ke_g = dist.scene_shard(mesh, keys)

    def scenes(ke, a, b, v):
        def one(k, ai, bi, vi):
            rp = epipolar.find_E_ransac(
                k, ai, bi, vi, num_hypotheses=128,
                sampson_thresh=1e-5, min_inliers=32)
            return rp.ok, rp.num_inliers

        ok, inl = jax.vmap(one)(ke, a, b, v)
        # hypothesis axis replicates the solve; average is a no-op check
        inl = jax.lax.pmean(inl.astype(jnp.float32), "hyp")
        return jax.lax.psum(jnp.sum(inl), "scene"), jax.lax.psum(
            jnp.sum(ok.astype(jnp.int32)), "scene")

    total_inl, total_ok = jax.jit(
        shard_map(
            scenes, mesh=mesh,
            in_specs=(P("scene"), P("scene"), P("scene"), P("scene")),
            out_specs=(P(), P()),
            # the jacobi-sweep scan carries an invariant V alongside the
            # scene-varying A; relax the varying-manual-axes check the
            # same way parallel/multiscene.py does
            check_vma=False,
        )
    )(ke_g, xi_g, xj_g, va_g)
    total_inl = float(total_inl)
    total_ok = int(total_ok)
    assert total_ok == S, (total_ok, S)
    assert total_inl > 0.9 * S * N, total_inl
    print(f"[w{pid}] scene-sharded two-view ok "
          f"(scenes={total_ok} inliers={total_inl:.0f})", flush=True)
    print(f"[w{pid}] PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
