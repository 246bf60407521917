"""Worker script for tests/test_multihost.py: one JAX process of a 2-process
CPU 'cluster' (4 virtual devices per process -> one global 8-device mesh).

Runs a deterministic DP train step over the global mesh and prints the loss;
the parent test asserts both processes print the same value and that it
matches a single-process 8-device run of the identical step.  This exercises
REAL cross-process collectives (jax.distributed + the CPU collectives
backend) on the same code path that rides ICI/DCN on a TPU pod
(parallel/multihost.py, SURVEY §5 'distributed communication backend').
"""
import os
import sys

# Multi-process mode: MH_LOCAL_DEVICES virtual devices per process (default
# 4, i.e. 2 processes -> 8 global; the 4-process rehearsal uses 2).  The
# MH_SINGLE=1 control leg is ONE process standing in for the whole cluster,
# so it needs all 8 devices locally or the n_global assert below fails.
_LOCAL_DEVICES = (8 if os.environ.get("MH_SINGLE") == "1"
                  else int(os.environ.get("MH_LOCAL_DEVICES", "4")))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_LOCAL_DEVICES}"
).strip()
# fp32: the parent compares losses across runs bit-tightly
os.environ["MBEXWN_WN_DTYPE"] = ""
os.environ["MBEXWN_SUBNET_DTYPE"] = ""

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # before any backend init

    single = os.environ.get("MH_SINGLE") == "1"
    if not single:
        from mbexwn_vocoder_tpu.parallel.multihost import initialize

        ok = initialize(
            coordinator_address=os.environ["MH_COORD"],
            num_processes=int(os.environ["MH_NPROC"]),
            process_id=int(os.environ["MH_PID"]),
        )
        assert ok, "jax.distributed failed to initialize"

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.models import create_model
    from mbexwn_vocoder_tpu.training import Trainer

    n_global = len(jax.devices())
    assert n_global == 8, (n_global, jax.process_count())
    mesh = Mesh(np.array(jax.devices()), ("data",))

    hp = read_config(mv.get_config_file("SPEECH"))
    mc = hp["mbexwn_config"]
    mc["pp_mod_subnet"].update(n_channels=16, n_layers=2, n_out_channels=8)
    mc["normalize_rms_from_mell"] = False
    model, _ = create_model(hp, hp["training_config"], hp["preprocess_config"], quiet=True)
    trainer = Trainer(model, hp, mesh=mesh)

    T_mel, B = 8, 8
    hop = hp["preprocess_config"]["hop_size"]
    rng = np.random.RandomState(0)  # same global batch on every process
    host_batch = {
        "audio": (rng.randn(B, T_mel * hop).astype(np.float32) * 0.1),
        "mel": (rng.randn(B, T_mel, 80) * 0.5 - 4).astype(np.float32),
        "F0": (120 + 10 * rng.randn(B, T_mel * hop)).astype(np.float32),
    }
    sh = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_callback(v.shape, sh, lambda idx, v=v: v[idx])
        for k, v in host_batch.items()
    }

    state = trainer.init_state(jax.random.PRNGKey(0), T_mel=T_mel, batch_size=B)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    with jax.set_mesh(mesh):
        _, metrics = trainer.jitted_train_step()(state, batch, jax.random.PRNGKey(1))
        total = float(metrics["total_loss"])
    print(f"MH_RESULT process={jax.process_index()}/{jax.process_count()} "
          f"devices={n_global} loss={total:.6f}", flush=True)


if __name__ == "__main__":
    main()
