"""Epoch-level trainer: the TPU-native equivalent of the reference's
Lightning ``CoolSystem`` + ``Trainer`` (multiclass_training_folds.py:449-817).

Responsibilities:
- epoch loop with periodic validation (``check_val_every_n_epoch`` =
  ``val_freq``, :800-811);
- validation: loss, micro Jaccard, macro Dice, presence-gated per-class
  tracker, aggregated confusion matrix (:575-731);
- checkpointing on the monitored metric (val/dice max top-1 for CV;
  train/loss min top-3 for final retrain) + resume;
- learning-rate logging per epoch (:734-737);
- dynamic datasets: ``set_epoch`` re-draws clip subsets per epoch
  (dyn_multiclass_training.py:739-747);
- preemption safety (beyond-reference: the reference has no failure
  handling, only manual ``-resume_path``): SIGTERM/SIGINT set a flag
  checked between steps; the trainer checkpoints ``last_<step>`` and
  returns cleanly, and the same ``resume()`` path continues the run —
  the standard discipline for preemptible TPU pools.
"""

from __future__ import annotations

import dataclasses
import signal
import threading
import time

import jax
import numpy as np

from vivim_tpu.train import loop as loop_lib
from vivim_tpu.train.checkpoints import CheckpointManager
from vivim_tpu.train.logging import MetricLogger
from vivim_tpu.train.metrics import MulticlassMetricsTracker


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 50
    val_freq: int = 1
    lr: float = 1e-4
    weight_decay: float = 1e-2
    num_classes: int = 3
    loss: str = "recall_focused"
    monitor: str = "val/dice"
    monitor_mode: str = "max"
    top_k: int = 1
    log_every: int = 10
    seed: int = 42
    bf16: bool = False  # cast-params mixed precision (fp32 scan state kept)
    grad_accum: int = 1  # micro-batch gradient accumulation per step
    decay_mask: str = "tagged"  # "torch" = decay all params (ref parity)
    profile_dir: str | None = None  # jax.profiler trace of early train steps
    profile_steps: int = 5
    zero: bool = False  # ZeRO/FSDP: shard params + AdamW moments over 'data'


def confusion_matrix_from_labels(preds, targets, num_classes):
    """Aggregated C x C confusion matrix (rows = GT, cols = pred)."""
    cm = np.zeros((num_classes, num_classes), np.int64)
    idx = targets.reshape(-1) * num_classes + preds.reshape(-1)
    counts = np.bincount(idx, minlength=num_classes * num_classes)
    return cm + counts.reshape(num_classes, num_classes)


class Trainer:
    def __init__(self, model, cfg: TrainerConfig, train_loader, val_loader,
                 ckpt_dir: str, logger: MetricLogger, mesh=None,
                 with_edge: bool = False, edge_loss_fn=None):
        self.model = model
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh
        self.logger = logger
        self.with_edge = with_edge
        self.ckpt = CheckpointManager(
            ckpt_dir, monitor=cfg.monitor, mode=cfg.monitor_mode,
            top_k=cfg.top_k)

        steps_per_epoch = max(len(train_loader), 1)
        self.total_steps = cfg.epochs * steps_per_epoch
        import jax.numpy as jnp

        sample = next(iter(train_loader))
        sample_clip = jnp.zeros(sample["clip"].shape, jnp.float32)
        self.state, self.tx = loop_lib.create_train_state(
            model, sample_clip, jax.random.PRNGKey(cfg.seed), cfg.lr,
            cfg.weight_decay, self.total_steps, mesh=mesh,
            decay_mask=cfg.decay_mask)
        _, self.lr_schedule = loop_lib.make_optimizer(
            cfg.lr, cfg.weight_decay, self.total_steps,
            decay_mask=cfg.decay_mask)
        compute_dtype = jnp.bfloat16 if cfg.bf16 else None
        # ZeRO/FSDP (parallel/fsdp.py): shard params + optimizer moments
        # leaf-wise over the 'data' axis; the jitted step's out_shardings
        # keep the carried state sharded across steps.  Placement happens
        # at fit() time, after any pretrained-weight grafts.
        self.state_shardings = None
        if cfg.zero:
            dp = dict(mesh.shape).get("data", 1) if mesh is not None else 1
            if dp <= 1:
                # a silently ignored parallelism flag reads as a working
                # config — refuse instead (same contract as the binary/
                # polyp CLIs, cli/common.setup_data_parallelism)
                raise ValueError(
                    "zero=True shards params + optimizer moments over the "
                    f"'data' mesh axis, but this run has {dp} 'data' "
                    "device(s) — pass -n_devices N (N > 1) or drop -zero")
            from vivim_tpu.parallel.fsdp import fsdp_state_shardings
            self.state_shardings = fsdp_state_shardings(self.state, mesh)
        # donate the carried state: the trainer only ever holds the newest
        # state, so XLA can alias params/opt buffers in place instead of
        # double-buffering them (~0.9 GB at the 60M-param config)
        self.train_step = loop_lib.make_train_step(
            model, cfg.loss, cfg.num_classes, self.tx,
            edge_loss_fn=edge_loss_fn if with_edge else None,
            compute_dtype=compute_dtype, grad_accum=cfg.grad_accum,
            donate=True, state_shardings=self.state_shardings)
        self.eval_step = loop_lib.make_eval_step(
            model, cfg.loss, cfg.num_classes, with_edge=with_edge,
            compute_dtype=compute_dtype,
            edge_loss_fn=edge_loss_fn if with_edge else None)
        self.epoch = 0
        self.preempted = False
        self._skip_batches = 0  # mid-epoch resume: batches already consumed

    def _install_preemption_handlers(self):
        """Install SIGTERM/SIGINT -> flag handlers (main thread only);
        returns the previous handlers for restoration."""
        if threading.current_thread() is not threading.main_thread():
            return {}

        def _flag(signum, frame):
            self.preempted = True
            print(f"[trainer] caught signal {signum}: finishing the current "
                  "step, checkpointing, and exiting cleanly")

        prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(sig, _flag)
            except (ValueError, OSError):  # non-main ctx / unsupported
                pass
        return prev

    def resume(self, path: str | None = None):
        self.state = self.ckpt.restore(self.state, path)
        spe = max(len(self.train_loader), 1)
        self.epoch = int(self.state.step) // spe
        # mid-epoch checkpoint (preemption): the loader's per-epoch order is
        # deterministic given set_epoch, so skipping the consumed prefix
        # continues the exact batch sequence
        self._skip_batches = int(self.state.step) - self.epoch * spe
        print(f"[trainer] resumed at step {int(self.state.step)} "
              f"(epoch {self.epoch}"
              + (f", skipping {self._skip_batches} consumed batches"
                 if self._skip_batches else "") + ")")

    def _device_batch(self, batch):
        batch = {k: v for k, v in batch.items() if k != "paths"}
        if self.mesh is not None:
            from vivim_tpu.parallel.mesh import shard_batch
            return shard_batch(batch, self.mesh)
        return batch

    def train_epoch(self):
        self.train_loader.set_epoch(self.epoch)
        skip, self._skip_batches = self._skip_batches, 0
        losses, jaccs = [], []
        t0 = time.time()
        n_frames = 0
        profiling = (self.cfg.profile_dir is not None and self.epoch == 0)
        for i, batch in enumerate(self.train_loader):
            if i < skip:
                continue
            if profiling and i == 1:  # skip the compile step
                jax.profiler.start_trace(self.cfg.profile_dir)
            if profiling and i == 1 + self.cfg.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
            if self.preempted:
                break
            n_frames += batch["clip"].shape[0] * batch["clip"].shape[1]
            self.state, metrics = self.train_step(
                self.state, self._device_batch(batch))
            losses.append(metrics["loss"])
            jaccs.append(metrics["jaccard"])
            if i % self.cfg.log_every == 0:
                self.logger.log(
                    {"train/loss": float(metrics["loss"]),
                     "train/jaccard": float(metrics["jaccard"]),
                     "train/grad_norm": float(metrics["grad_norm"])},
                    step=int(self.state.step))
        if profiling:  # epoch shorter than profile window
            jax.profiler.stop_trace()
        dt = max(time.time() - t0, 1e-9)
        epoch_metrics = {
            "train/loss": float(np.mean([float(l) for l in losses]))
            if losses else 0.0,
            "train/jaccard": float(np.mean([float(j) for j in jaccs]))
            if jaccs else 0.0,
            "train/lr": float(self.lr_schedule(int(self.state.step))),
            "train/frames_per_sec": n_frames / dt,
        }
        self.logger.log(epoch_metrics, step=int(self.state.step))
        return epoch_metrics

    def validate(self):
        tracker = MulticlassMetricsTracker(self.cfg.num_classes)
        cm = np.zeros((self.cfg.num_classes,) * 2, np.int64)
        losses = []
        for batch in self.val_loader:
            # metric accumulation happens on device (make_eval_step): only
            # the (B*T, C, 4) counters and the (C, C) matrix come to host
            loss, conf, cm_b = self.eval_step(
                self.state, self._device_batch(batch))
            losses.append(float(loss))
            tracker.update_from_confusion(np.asarray(conf))
            cm += np.asarray(cm_b, dtype=np.int64)
        results = tracker.get_results()
        # aggregate-set metrics from the confusion matrix: micro Jaccard
        # (torchmetrics MulticlassJaccardIndex average="micro") and macro
        # Dice over classes present in GT or prediction (torchmetrics
        # DiceScore average="macro" — the checkpoint monitor, :644-650)
        tp = np.diag(cm).sum()
        total = cm.sum()
        tps = np.diag(cm).astype(np.float64)
        fps = (cm.sum(0) - np.diag(cm)).astype(np.float64)
        fns = (cm.sum(1) - np.diag(cm)).astype(np.float64)
        micro_jacc = tps.sum() / max((tps + fps + fns).sum(), 1)
        denom = 2 * tps + fps + fns
        present = denom > 0
        macro_dice = float(np.mean(2 * tps[present] / denom[present]))             if present.any() else 0.0
        metrics = {
            "val/loss": float(np.mean(losses)) if losses else 0.0,
            "val/jacc": float(micro_jacc),
            "val/dice": macro_dice,
            "val/accuracy": float(tp / max(total, 1)),
        }
        for m in tracker.TRACKED:
            metrics[f"val/{m}_mean"] = results[m]["mean"]
            for c, v in enumerate(results[m]["per_class"]):
                if v is not None:
                    metrics[f"val/{m}_class{c}"] = v
        self.logger.log(metrics, step=int(self.state.step))
        self.logger.log_confusion_matrix(
            cm, [f"class_{i}" for i in range(self.cfg.num_classes)],
            step=int(self.state.step))
        return metrics, results, cm

    def fit(self, resume_path: str | None = None):
        if resume_path:
            self.resume(resume_path)
        if self.state_shardings is not None:
            # (re-)place the state FSDP-sharded — after __init__ grafts
            # (HF segformer / pretrained ckpt) and after resume()
            self.state = jax.device_put(self.state, self.state_shardings)
        best = None
        prev_handlers = self._install_preemption_handlers()
        try:
            while self.epoch < self.cfg.epochs:
                em = self.train_epoch()
                if self.preempted:
                    # save a resumable 'last' (metrics={} -> no best-score
                    # update) and leave; resume() continues from here
                    self.ckpt.save(self.state, int(self.state.step), {})
                    print(f"[trainer] preempted at step "
                          f"{int(self.state.step)} (epoch {self.epoch}): "
                          f"checkpoint saved, exiting")
                    break
                metrics = dict(em)
                if (self.epoch + 1) % self.cfg.val_freq == 0 and len(
                        self.val_loader) > 0:
                    vm, _, _ = self.validate()
                    metrics.update(vm)
                self.epoch += 1
                saved = self.ckpt.save(self.state, int(self.state.step),
                                       metrics)
                if saved:
                    best = metrics.get(self.cfg.monitor)
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
        self.ckpt.wait()
        return best
