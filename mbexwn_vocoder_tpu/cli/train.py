"""CLI: train an MBExWN model (the trainer the reference family was designed
for but never shipped -- SURVEY §1).

Data parallelism: pass --n_devices > 1 to shard the batch over a device mesh
(all local devices by default when n_devices == 0).
"""
from __future__ import annotations

import os
import sys
import time


def main(model_id, data_dir, output_dir, steps=10000, batch_size=None, n_devices=1,
         save_every=None, log_every=50, seed=42, cargs=None, resume=True, num_workers=2,
         init_from=None, init_step=0):
    # No-op-leg fast path: a staged retrain chain (tools/train_chain.sh)
    # re-runs earlier --steps targets when resuming a later stage; if the
    # Orbax checkpoint already reached this target AND the inference export
    # exists, there is nothing to train — print the chain's done marker and
    # exit WITHOUT building the model or claiming the single-tenant TPU
    # (saves ~3 min + a device claim per replayed leg).  Orbax step dirs are
    # integer-named (training/checkpointing.py), so this is pure filesystem.
    if resume:
        _ckdir = os.path.join(output_dir, "checkpoints")
        try:
            _done = max((int(d) for d in os.listdir(_ckdir) if d.isdigit()), default=-1)
        except OSError:
            _done = -1
        if (_done >= steps and os.path.exists(os.path.join(output_dir, "weights.npz"))
                and os.path.exists(os.path.join(output_dir, "config.yaml"))):
            print(f"checkpoint already at step {_done} >= target {steps}; nothing to train",
                  file=sys.stderr)
            print(f"exported inference model to {output_dir}", file=sys.stderr)
            return

    import numpy as np

    import jax
    import jax.numpy as jnp

    from .. import get_config_file
    from ..config import config_utils as cutils
    from ..models.factory import create_model
    from ..observability import MetricsLogger, model_summary
    from ..training.checkpointing import CheckpointManager
    from ..training.data import PrefetchLoader, SegmentDataset
    from ..training.trainer import Trainer

    try:  # persistent compile cache: restarts skip the multi-minute fwd+bwd compile
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    hparams = cutils.read_config(get_config_file(model_id_or_path=model_id))
    if cargs:
        cutils.modify_config(hparams, cargs)
    tc = hparams["training_config"]
    pc = hparams["preprocess_config"]
    cc = hparams["checkpoint_config"]
    batch_size = batch_size or tc["train_batch_size"]
    save_every = save_every or cc.get("save_model_every", 2000)

    os.makedirs(output_dir, exist_ok=True)

    mesh = None
    if n_devices != 1:
        from jax.sharding import Mesh

        devs = jax.devices()
        n = len(devs) if n_devices == 0 else n_devices
        mesh = Mesh(np.array(devs[:n]), ("data",))
        if batch_size % n:
            raise RuntimeError(f"batch_size {batch_size} must be divisible by n_devices {n}")

    model, _ = create_model(hparams, tc, pc, quiet=True)
    trainer = Trainer(model, hparams, mesh=mesh)
    T_mel = pc["segment_length"] // pc["hop_size"] + 1
    state = trainer.init_state(jax.random.PRNGKey(seed), T_mel=8, batch_size=batch_size)

    ckpt = CheckpointManager(os.path.join(output_dir, cc.get("checkpoint_dir", "checkpoints")),
                             max_to_keep=cc.get("max_to_keep", 5))
    resumed = False
    if resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            resumed = True
            print(f"resumed from step {int(state.step)}", file=sys.stderr)

    # warm start: continue training from published inference weights (.npz)
    # when the Orbax training state is gone (e.g. a workspace reset wiped the
    # gitignored run dir but the registry checkpoint survived).  Fresh
    # optimizer moments; `init_step` keeps the step-keyed pieces (loss
    # schedules, leg targets, data-stream offset) on the original timeline.
    # An existing Orbax checkpoint takes precedence.
    if (not resumed) and init_from:
        from ..compat.params_io import load_params
        from ..training.trainer import TrainState

        warm = jax.tree_util.tree_map(jnp.asarray, load_params(init_from))
        ref_struct = jax.tree_util.tree_structure(state.params)
        if jax.tree_util.tree_structure(warm) != ref_struct:
            raise RuntimeError(
                f"--init_from {init_from}: parameter tree structure does not "
                f"match this config's model")
        mismatch = [
            p for p, (a, b) in zip(
                (jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(warm)[0]),
                zip(jax.tree_util.tree_leaves(warm), jax.tree_util.tree_leaves(state.params)))
            if a.shape != b.shape]
        if mismatch:
            raise RuntimeError(f"--init_from {init_from}: shape mismatch at {mismatch[:4]}")
        opt_state = trainer.optimizer.init(warm)
        if init_step:
            # keep step-keyed optimizer pieces (an lr_schedule's position,
            # adam bias correction) on the original timeline instead of
            # replaying from 0 (advisor round-4 note; moments still start
            # fresh -- they re-estimate within ~1/(1-b2) steps)
            from ..training.trainer import fast_forward_opt_state

            opt_state = fast_forward_opt_state(opt_state, init_step)
        state = TrainState(params=warm, opt_state=opt_state, step=jnp.int32(init_step))
        resumed = True  # trained params: skip activation pretraining
        print(f"warm-started from {init_from} at step {init_step}", file=sys.stderr)

    # activation pretraining per the reference's config contract
    # (pretrain_activations_target/_max_iters/_to_rmse/_lr, config_utils.py:404-407)
    if (not resumed) and tc.get("pretrain_activations_target"):
        from ..training.pretrain import pretrain_activations

        dataset0 = SegmentDataset(data_dir, pc, seed=seed)
        import jax.numpy as jnp2

        cal_mels = [jnp2.asarray(dataset0.batch(batch_size)["mel"]) for _ in range(2)]
        print("pretraining activation statistics...", file=sys.stderr)
        new_params, ploss = pretrain_activations(
            model, state.params, cal_mels,
            target=tc["pretrain_activations_target"],
            max_iters=tc.get("pretrain_activations_max_iters", 100),
            lr=tc.get("pretrain_activations_lr", 1e-2),
            to_rmse=tc.get("pretrain_activations_to_rmse", 0.05),
        )
        from ..training.trainer import TrainState

        state = TrainState(params=new_params, opt_state=trainer.optimizer.init(new_params),
                           step=state.step)
        print(f"pretraining done (stats loss {ploss:.4f})", file=sys.stderr)

    model_summary(model, state.params, T_mel=T_mel, print_fn=lambda s: print(s, file=sys.stderr))

    # offset the data/noise streams by the resume step: a resumed leg (see
    # train_chain.sh leg restarts) must not replay the exact segment sequence
    # the previous leg already trained on
    data_seed = seed + int(state.step)
    dataset = SegmentDataset(data_dir, pc, seed=data_seed)
    loader = PrefetchLoader(dataset, batch_size, num_workers=num_workers)
    logger = MetricsLogger(os.path.join(output_dir, cc.get("log_dir", "logs")))

    step_fn = trainer.jitted_train_step()

    # Compact uploads (TPU relay note): host->device moves ~10 MB/s here, so
    # the raw fp32 batch (audio 3 MB + sample-rate F0 3 MB + mel 0.8 MB at
    # batch 32) costs more wall time than the train step itself (measured
    # 0.57 s/step, upload-bound).  Ship the F0 target pre-strided to the
    # pulse rate — exactly the values training_forward keeps, bit-identical —
    # and, unless MBEXWN_UPLOAD_FP16=0, audio/mel as fp16 (dequantized to
    # fp32 on device; a ~-66 dB quantization floor, far below model error).
    upload_fp16 = os.environ.get("MBEXWN_UPLOAD_FP16", "1") != "0"
    if upload_fp16:
        # visible numerics notice (advisor round-4): audio/mel conditioning
        # crosses host->device as fp16 (~-66 dB quantization floor, measured
        # <5e-3 relative loss effect).  The win is only the relay's ~10 MB/s
        # upload path; set MBEXWN_UPLOAD_FP16=0 on fast-upload hosts.
        print("upload: audio/mel as fp16 (relay-bandwidth mode; "
              "MBEXWN_UPLOAD_FP16=0 for fp32 uploads)", file=sys.stderr)
    f0_down = trainer.F0_down

    def _prep(b):
        out = {}
        for k, v in b.items():
            if k == "F0":
                out["F0_ds"] = jnp.asarray(np.ascontiguousarray(v[:, ::f0_down]))
            elif upload_fp16 and k in ("audio", "mel"):
                out[k] = jnp.asarray(np.asarray(v, dtype=np.float16))
            else:
                out[k] = jnp.asarray(v)
        return out

    rng = jax.random.PRNGKey(data_seed + 1)
    t_last = time.time()
    # Host-memory note (axon relay backend, measured 2026-08-20): the runtime
    # retains ~7 MB of host memory PER TRAINING STEP (~= the uploaded batch;
    # its async-enqueue bookkeeping), and neither gc.collect() nor explicitly
    # .delete()-ing the input/metric arrays after the step releases it — a
    # single 20k-step process OOMs a 125 GB host around step 13k.  The
    # mitigation lives in tools/train_chain.sh: train in process LEGS that
    # resume from the Orbax checkpoint, bounding RSS per leg.  The rss=
    # field in the log line keeps the growth visible; MBEXWN_GC_EVERY stays
    # as a knob for non-relay backends.
    import gc

    gc_every = int(os.environ.get("MBEXWN_GC_EVERY", "200") or 0)

    def _rss_gb() -> float:
        try:
            with open("/proc/self/statm") as f:
                return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e9
        except Exception:
            return 0.0

    try:
        for batch in loader:
            if int(state.step) >= steps:
                break
            rng, sub = jax.random.split(rng)
            jb = _prep(batch)
            if mesh is not None:
                with mesh:
                    state, metrics = step_fn(state, jb, sub)
            else:
                state, metrics = step_fn(state, jb, sub)
            step = int(state.step)
            if step % log_every == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                logger.log(step, m)
                dt = time.time() - t_last
                t_last = time.time()
                loss_str = " ".join(f"{k}:{v:7.4f}" for k, v in sorted(m.items()))
                print(f"step {step:7d} ({dt:5.1f}s/{log_every}) rss={_rss_gb():.1f}G {loss_str}",
                      file=sys.stderr)
            if gc_every and step % gc_every == 0:
                gc.collect()
            if step % save_every == 0:
                ckpt.save(step, state)
    finally:
        loader.close()

    ckpt.save(int(state.step), state)
    # export inference weights
    from ..compat.params_io import save_params

    save_params(os.path.join(output_dir, "weights.npz"), state.params)
    cutils.dump_config(os.path.join(output_dir, "config.yaml"), hparams)
    print(f"exported inference model to {output_dir}", file=sys.stderr)


def cli():
    from ..platform import apply_platform_override

    apply_platform_override()
    from argparse import ArgumentParser

    parser = ArgumentParser(description="train an MBExWN vocoder model")
    parser.add_argument("model_id", help="model id or model directory (config source)")
    parser.add_argument("-d", "--data_dir", required=True, help="directory with training wavs")
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("-b", "--batch_size", type=int, default=None)
    parser.add_argument("--n_devices", type=int, default=1,
                        help="data-parallel device count (0 = all local devices)")
    parser.add_argument("--save_every", type=int, default=None)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_workers", type=int, default=2,
                        help="prefetch threads extracting mel/F0 targets")
    parser.add_argument("--no_resume", dest="resume", action="store_false")
    parser.add_argument("--init_from", default=None,
                        help="warm-start params from an inference weights.npz "
                             "(used only when no Orbax checkpoint restores)")
    parser.add_argument("--init_step", type=int, default=0,
                        help="step counter to start from with --init_from")
    parser.add_argument("-a", "--cargs", default=None, nargs="+",
                        help="config overrides with ':' as field separator")
    args = parser.parse_args()
    main(**vars(args))


if __name__ == "__main__":
    cli()
