"""Training loop: jitted steps over a device mesh + callback bus.

Rebuild of the reference's ``NetInterface.train_epoch``
(/root/reference/models/netinterface.py:157-287) with the TPU execution
model: the model's ``train_step``/``eval_step`` are jitted once with the
state replicated and the batch sharded over the mesh's data-parallel axis;
per-batch metrics come back as device scalars and are synced once per
batch for logging (matching the reference's logging granularity, but with
all compute in one fused program).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..core.checkpoint import (load_checkpoint, resume_path, save_checkpoint)
from ..parallel import mesh as pmesh
from .loggers import ComposeLogger, LogCumulator
from .state import (reference_payload_to_state, state_to_reference_payload)

# batch keys holding binary occupancy grids, eligible for bit-packed
# host->device transport (_device_batch pack / decompress_batch unpack)
_PACK_KEYS = ("voxel", "voxel_canon")


def decompress_batch(batch: Dict) -> Dict:
    """Widen wire-compressed batch leaves inside the jitted step.

    Binary GT grids travel bit-packed (32x less tunnel/DCN traffic than
    f32, see Trainer._device_batch); a packed cubic grid is recognizable
    by its last dim being 1/8 of the second-to-last.  Anything uint8
    widens to f32."""
    import jax.numpy as jnp
    out = {}
    for k, v in batch.items():
        if (k in _PACK_KEYS and v.dtype == jnp.uint8
                and v.ndim >= 2 and v.shape[-1] * 8 == v.shape[-2]):
            bits = (v[..., None]
                    >> (7 - jnp.arange(8, dtype=jnp.uint8))) & 1
            v = bits.reshape(*v.shape[:-1], v.shape[-1] * 8)
        if v.dtype in (jnp.uint8, jnp.float16):
            v = v.astype(jnp.float32)
        out[k] = v
    return out


class Trainer:
    def __init__(self, model, opt, logger: Optional[ComposeLogger] = None,
                 mesh=None, visualizer=None):
        self.model = model
        self.opt = opt
        self.logger = logger or ComposeLogger([])
        self.cumulator = LogCumulator()
        self.logger.add_logger(self.cumulator)
        self.mesh = mesh or pmesh.make_mesh()
        pmesh.set_active_mesh(self.mesh)
        # XLA:CPU runs virtual-device collectives on a small shared thread
        # pool; overlapping two collective programs (step i's gradient
        # all-reduce still in flight while step i+1 launches -- metrics
        # only depend on the loss, so their fetch does not drain the
        # program) can deadlock the 8-way rendezvous on few-core hosts.
        # Serialize program launches on CPU; TPU keeps async dispatch.
        self._serialize_steps = jax.default_backend() == "cpu"
        self.visualizer = visualizer
        self.state = None
        self.start_epoch = 0
        self.initial_loss_eval = float("inf")

        rep = pmesh.replicated(self.mesh)
        shard = pmesh.batch_sharding(self.mesh)

        _decompress = decompress_batch

        # batch leaves are arrays (sharded); rng + state replicated
        self._train_step = jax.jit(
            lambda s, b, r: model.train_step(s, _decompress(b), r),
            in_shardings=(rep, shard, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            lambda s, b, r: model.eval_step(s, _decompress(b), r),
            in_shardings=(rep, shard, rep),
            out_shardings=(rep, rep),
        )

    # ------------------------------------------------------------ state io
    def initialize(self, rng: jax.Array):
        self.state = pmesh.replicate_state(self.model.init_state(rng),
                                           self.mesh)
        return self.state

    def save(self, path: str, epoch: int, loss_eval: Optional[float] = None):
        payload = state_to_reference_payload(
            self.state, self.model.net_names, self.model.optimizer_names,
            epoch, loss_eval if loss_eval is not None
            else self.initial_loss_eval)
        save_checkpoint(path, payload)

    def load(self, path: str):
        payload = load_checkpoint(path)
        self.state = pmesh.replicate_state(
            reference_payload_to_state(payload, self.state), self.mesh)
        self.start_epoch = int(payload.get("epoch", 0))
        self.initial_loss_eval = float(payload.get("loss_eval", np.inf))
        return payload

    def maybe_resume(self, logdir: str, resume: int):
        path = resume_path(logdir, resume)
        if path is None:
            return None
        if not os.path.isfile(path):
            raise FileNotFoundError(f"resume checkpoint not found: {path}")
        return self.load(path)

    # ------------------------------------------------------------- batches
    def _device_batch(self, batch: Dict):
        arrays = {}
        rest = {}
        for k, v in batch.items():
            if not isinstance(v, np.ndarray):
                rest[k] = v
            elif (k in _PACK_KEYS and v.dtype == np.float32
                  and v.shape[-1] % 8 == 0
                  and v.shape[-1] // 8 != v.shape[-2]
                  and np.array_equal(v, v.astype(bool))):
                # binary grids: ship bit-packed (1 bit/voxel instead of
                # 32), unpacked in the jitted step (_decompress).  The
                # shape guard keeps pack/unpack recognition unambiguous.
                arrays[k] = np.packbits(v.astype(np.uint8), axis=-1)
            elif k in _PACK_KEYS and v.dtype == np.float32:
                # non-packable (odd shape / non-binary): ship uint8 when
                # lossless, else as-is
                arrays[k] = (v.astype(np.uint8)
                             if np.array_equal(v, v.astype(np.uint8)) else v)
            elif v.dtype == np.float32 and v.ndim >= 3:
                # per-pixel/per-voxel payloads (images, depth, spherical
                # maps): ship f16 -- its 10-bit mantissa sits strictly
                # below the bf16 (8-bit) compute precision of every model,
                # and halves tunnel/DCN bytes.  Small precision-critical
                # leaves (camera matrices etc.) are ndim<=2 and stay f32.
                arrays[k] = v.astype(np.float16)
            else:
                arrays[k] = v
        # true (pre-padding) batch size for metric weighting: shard_batch
        # may repeat samples to satisfy mesh divisibility
        for v in arrays.values():
            rest["_true_size"] = v.shape[0]
            break
        return pmesh.shard_batch(arrays, self.mesh), rest

    def train_epoch_pair(self, epoch: int, train_iter, eval_loader,
                         steps_per_epoch: int, eval_batches: int,
                         rng: jax.Array) -> Dict[str, float]:
        """One train phase + one eval phase (netinterface.py:282-285)."""
        log = self._run_phase(epoch, train_iter, steps_per_epoch, rng,
                              training=True)
        if eval_batches:
            log = self._run_phase(epoch, iter(eval_loader), eval_batches,
                                  rng, training=False)
        return log

    def _prefetched(self, data_iter, steps: int):
        """One-step-lookahead pipeline: the next batch is fetched and
        device_put on a worker thread while the current step runs
        (replaces the reference's DataLoader-worker overlap,
        netinterface.py:244-252)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)

        def worker():
            try:
                for _ in range(steps):
                    t0 = time.time()
                    batch = next(data_iter)
                    dev_batch, rest = self._device_batch(batch)
                    q.put((dev_batch, rest, batch, time.time() - t0))
            except Exception as e:          # surface in the main thread
                q.put(e)

        threading.Thread(target=worker, daemon=True).start()
        for _ in range(steps):
            item = q.get()
            if isinstance(item, Exception):
                raise item
            yield item

    def _run_phase(self, epoch: int, data_iter, steps: int, rng: jax.Array,
                   training: bool) -> Dict[str, float]:
        """Metric fetches are deferred by up to ``opt.log_every`` steps
        during training (default 1 = reference-faithful per-batch logging):
        a per-step ``float(metrics)`` SYNCS the pipeline on the loss, which
        is ready long before the gradient all-reduce/update tail -- so
        every step pays a host round-trip of dead time.  Buffering the tiny
        device scalars and flushing every k steps keeps logging exact
        (same values, same order) while steps dispatch back-to-back."""
        logger = self.logger
        logger.train() if training else logger.eval()
        logger.on_epoch_begin(epoch)
        t_end = time.time()
        eval_pred = None
        log_every = max(int(getattr(self.opt, "log_every", 1) or 1), 1) \
            if training else 1
        pending = []

        def flush():
            for i0, m_dev, base in pending:
                m = {k: float(v) for k, v in jax.device_get(m_dev).items()}
                logger.on_batch_begin(i0)
                logger.on_batch_end(i0, {**base, **m})
            pending.clear()

        for i, (dev_batch, rest, batch, data_time) in enumerate(
                self._prefetched(data_iter, steps)):
            step_rng = jax.random.fold_in(rng, epoch * 1_000_003 + i
                                          + (0 if training else 500_000))
            if training:
                self.state, metrics = self._train_step(
                    self.state, dev_batch, step_rng)
            else:
                metrics, eval_pred = self._eval_step(
                    self.state, dev_batch, step_rng)
                self._maybe_visualize(epoch, i, eval_pred, batch)
            if self._serialize_steps:
                jax.block_until_ready(self.state if training else eval_pred)
            batch_time = time.time() - t_end
            size = rest.get("_true_size", self.opt.batch_size)
            base = {"size": size}
            if getattr(self.opt, "log_time", False):
                base["batch_time"] = batch_time
                base["data_time"] = data_time
            pending.append((i, metrics, base))
            if len(pending) >= log_every:
                flush()
            t_end = time.time()
        flush()
        epoch_log = self.cumulator.get_epoch_log()
        logger.on_epoch_end(epoch, epoch_log)
        self._last_eval_pred = eval_pred
        return epoch_log

    def _maybe_visualize(self, epoch, batch_idx, pred, batch):
        """Eval-time visualization every ``vis_every_vali`` epochs for the
        first ``vis_batches_vali`` batches (marrnetbase.py:57-66), plus the
        raw .npz dump."""
        if self.visualizer is None or pred is None:
            return
        opt = self.opt
        if epoch % max(getattr(opt, "vis_every_vali", 1), 1) != 0:
            return
        if batch_idx >= getattr(opt, "vis_batches_vali", 0):
            return
        outdir = os.path.join(opt.full_logdir, f"epoch{epoch:04d}_vali")
        os.makedirs(outdir, exist_ok=True)
        from ..models.test_base import _fetch_np
        pred_np = jax.tree.map(_fetch_np, pred)
        output = self.model.pack_output(pred_np, batch)
        self.visualizer.visualize(output, batch_idx, outdir)
        from ..utils.io import npz_compatible
        np.savez(os.path.join(outdir, f"batch{batch_idx:04d}"),
                 **{k: npz_compatible(v) for k, v in output.items()
                    if isinstance(v, np.ndarray)})

    # --------------------------------------------------------------- train
    def fit(self, train_loader, eval_loader, epochs: int,
            steps_per_epoch: int, eval_batches: int,
            rng: jax.Array, eval_at_start: bool = False):
        from ..data.loader import InfiniteLoader

        self.logger.set_params({
            "epoch": epochs,
            "steps_per_epoch": steps_per_epoch,
            "steps_per_eval": eval_batches,
            "metrics": self.model.metrics,
        })
        self.logger.on_train_begin()
        if eval_at_start:
            self._run_phase(self.start_epoch, iter(eval_loader),
                            eval_batches, rng, training=False)
        train_iter = InfiniteLoader(train_loader)
        last = {}
        for epoch in range(self.start_epoch + 1, epochs + 1):
            last = self.train_epoch_pair(
                epoch, train_iter, eval_loader, steps_per_epoch,
                eval_batches, rng)
        self.logger.on_train_end()
        return last
