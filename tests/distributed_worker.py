"""Worker process for the 2-process ``jax.distributed`` mesh test.

Each of two processes owns 4 virtual CPU devices; together they form the
8-device two-level (hosts x local-chips) mesh that ``make_two_level_mesh``
targets on real multi-host TPU systems (data axis = DCN hosts, edge axis =
ICI chips, SURVEY.md §7.7). The worker runs one sharded training step and one
sharded sampling call over GLOBAL arrays and prints a deterministic RESULT
line; the test asserts both ranks agree.

Run: ``python distributed_worker.py <port> <process_id>``.
"""

import os
import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ml_conformer_generator_tpu.config import DiffusionConfig, EGNNConfig
    from ml_conformer_generator_tpu.diffusion.schedule import gamma_schedule
    from ml_conformer_generator_tpu.models.egnn import init_egnn_params
    from ml_conformer_generator_tpu.parallel.mesh import make_two_level_mesh
    from ml_conformer_generator_tpu.parallel.sampler import \
        make_sharded_generate
    from ml_conformer_generator_tpu.training.step import (init_train_state,
                                                          make_train_step)
    from ml_conformer_generator_tpu.utils.masks import prepare_masks

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = make_two_level_mesh()          # data=2 hosts x edge=4 local
    assert dict(mesh.shape) == {"data": 2, "edge": 4}

    def to_global(arr, spec):
        arr = np.asarray(arr)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    cfg = EGNNConfig(hidden_nf=16, n_blocks=2)
    dcfg = DiffusionConfig(timesteps=4)
    # identical on both ranks: same seed, host-side init
    params = jax.tree.map(lambda a: to_global(a, P()),
                          init_egnn_params(jax.random.PRNGKey(0), cfg))

    B, N = 4, 8                           # B % data == 0, N % edge == 0
    rng = np.random.default_rng(0)
    node_mask, edge_mask = prepare_masks(
        jnp.asarray(rng.integers(N - 3, N + 1, size=B)), N)
    x = rng.standard_normal((B, N, 3)).astype(np.float32) * np.asarray(
        node_mask)
    x = x - (x.sum(1, keepdims=True) / np.asarray(node_mask).sum(
        1, keepdims=True)) * np.asarray(node_mask)
    batch = {
        "x": to_global(x, P("data")),
        "h": to_global(np.eye(8)[rng.integers(0, 8, (B, N))].astype(
            np.float32) * np.asarray(node_mask), P("data")),
        "node_mask": to_global(node_mask, P("data")),
        "edge_mask": to_global(edge_mask, P("data", None, "edge")),
        "context": to_global(rng.standard_normal((B, N, 3)).astype(
            np.float32) * np.asarray(node_mask), P("data")),
    }
    gamma = to_global(gamma_schedule(dcfg.timesteps), P())
    key = to_global(jax.random.key_data(jax.random.PRNGKey(1)), P())
    key = jax.random.wrap_key_data(key)

    step = make_train_step(mesh, cfg, dcfg)
    opt_state = jax.tree.map(lambda a: to_global(a, P()),
                             init_train_state(params))
    params2, opt_state, metrics = step(params, opt_state, key, batch, gamma)
    loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss), loss
    psum = float(sum(np.abs(np.asarray(l)).sum()
                     for l in jax.tree.leaves(params2)))

    gen = make_sharded_generate(mesh, cfg, dcfg)
    xs, hs = gen(params, key, gamma, batch["node_mask"], batch["edge_mask"],
                 batch["context"])
    # fully-addressable check per rank: local shards are finite
    for shard in xs.addressable_shards:
        assert np.isfinite(np.asarray(shard.data)).all()

    print(f"RESULT loss={loss:.10f} psum={psum:.6f} shape={xs.shape}",
          flush=True)


if __name__ == "__main__":
    main()
