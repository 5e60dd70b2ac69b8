"""Training loops — the TPU-native replacement for the Lightning harness.

``VAETrainer`` runs the dual-optimizer VAE-GAN (stage 1,
``configs/ae_accomp.yaml``); ``CFMTrainer`` runs flow-matching over frozen-VAE
latents (stage 2, ``configs/vocal2music.yaml``) with host-side frozen-T5
caption encoding, ``scale_by_std`` latent rescaling from the first batch
(``ddpm_audio.py:89-104``), optional EMA validation weights
(``ddpm.py:357-364``), monitored/last/exception checkpoints and
TensorBoard metrics (``main.py:705-790``, ``ddpm.py:341-364``).

TPU specifics:
  * batches are padded up to time-bucket multiples (default 128 frames) so
    XLA compiles a bounded set of shapes across the length-bucketed loader;
  * the train step is a single jitted function (optionally pjit over a mesh
    via versband_tpu.train.step.shard_train_step);
  * all host->device transfer happens in one ``device_put`` per batch.
"""

from __future__ import annotations

import math
import os
import signal
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from versband_tpu.data.collate import pad_or_cut_xd
from versband_tpu.train.callbacks import Callback
from versband_tpu.train.checkpoints import CheckpointManager
from versband_tpu.train.state import TrainState

MIDI_PAD, BEATS_PAD = 128, 2


def pad_batch_time(batch: Dict[str, np.ndarray], multiple: int = 128,
                   pad_value: float = -5.0) -> Dict[str, np.ndarray]:
    """Pad every [B, C, T] array to the next T multiple — bounds the number of
    compiled shapes over the bucketed loader."""
    out = dict(batch)
    for key, pad in (("image", pad_value), ("acoustic", pad_value),
                     ("midi", MIDI_PAD), ("beats", BEATS_PAD)):
        if key in out and hasattr(out[key], "ndim") and out[key].ndim == 3:
            T = out[key].shape[2]
            target = math.ceil(T / multiple) * multiple
            out[key] = pad_or_cut_xd(out[key], target, 2, pad)
    return out


class BaseTrainer:
    def __init__(self, logdir: str, max_steps: int = 10 ** 9,
                 max_epochs: int = 10 ** 6, val_every_n_epochs: int = 1,
                 log_every_n_steps: int = 50, callbacks: Optional[List[Callback]] = None,
                 ckpt: Optional[CheckpointManager] = None, seed: int = 0,
                 time_bucket: int = 128, use_tensorboard: bool = True):
        self.logdir = logdir
        self.max_steps = max_steps
        self.max_epochs = max_epochs
        self.val_every_n_epochs = val_every_n_epochs
        self.log_every_n_steps = log_every_n_steps
        self.callbacks = callbacks or []
        self.ckpt = ckpt or CheckpointManager(os.path.join(logdir, "checkpoints"))
        self.key = jax.random.PRNGKey(seed)
        self.time_bucket = time_bucket
        self.global_step = 0
        self.writer = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(os.path.join(logdir, "tb"))
            except Exception:
                self.writer = None
        self._sig_save = False
        try:
            signal.signal(signal.SIGUSR1, self._on_sigusr1)
            signal.signal(signal.SIGUSR2, self._on_sigusr2)
        except (ValueError, OSError):
            pass  # non-main thread

    def _on_sigusr1(self, *_):
        # SIGUSR1 -> checkpoint at the next batch boundary (main.py:835-852)
        self._sig_save = True

    @staticmethod
    def _on_sigusr2(*_):
        # SIGUSR2 -> drop into a debugger on the spot (main.py:849-852).
        # Unattended runs have no tty — pdb would wedge on closed stdin;
        # dump a traceback instead so the signal is still diagnostic.
        import sys

        try:
            interactive = sys.stdin is not None and sys.stdin.isatty()
        except (ValueError, OSError):
            interactive = False
        if interactive:
            import pdb

            pdb.set_trace()
        else:
            import traceback

            traceback.print_stack()

    def log_metrics(self, metrics: Dict[str, Any], step: int, prefix: str = ""):
        # val/test metrics arrive at arbitrary steps (epoch boundaries) and
        # must never be rate-gated; keys may carry their own val/test prefix
        eval_call = any(str(k).startswith(("val", "test"))
                        for k in [prefix, *metrics])
        if step % self.log_every_n_steps and not eval_call:
            return
        if prefix == "train/" and os.environ.get("VERSBAND_LOG_HBM"):
            # soak-run observability: HBM watermark rides the same cadence
            # as the scalars (one memory_stats RPC per logged step, not per
            # train step)
            from versband_tpu.utils.profiling import device_memory_stats

            stats = device_memory_stats()
            metrics = dict(metrics)
            for src, dst in (("peak_bytes_in_use", "hbm_peak_mib"),
                             ("bytes_in_use", "hbm_mib")):
                if src in stats:
                    metrics[dst] = stats[src]
        scal = {f"{prefix}{k}": float(np.asarray(v)) for k, v in metrics.items()
                if np.ndim(v) == 0}
        if self.writer is not None:
            for k, v in scal.items():
                self.writer.add_scalar(k, v, step)
        if eval_call or step % (self.log_every_n_steps * 10) == 0:
            pretty = ", ".join(f"{k}={v:.4f}" for k, v in list(scal.items())[:6])
            print(f"[step {step}] {pretty}")

    def save_checkpoint(self, name: str):
        raise NotImplementedError

    def _dispatch(self, fn_name: str, *args):
        for cb in self.callbacks:
            getattr(cb, fn_name)(self, *args)


class VAETrainer(BaseTrainer):
    """Stage-1 trainer (``AutoencoderKL.training_step`` semantics)."""

    def __init__(self, vae, loss, learning_rate: float, mesh=None,
                 accumulate_grad_batches: int = 1, **kw):
        super().__init__(**kw)
        from versband_tpu.train.state import make_adam
        from versband_tpu.train.vae_step import (
            make_vae_train_step, make_vae_eval_step)

        self.vae = vae
        self.loss = loss
        self.lr = learning_rate
        self.mesh = mesh  # data-parallel mesh for stage 1 (params replicated)
        self.accumulate_grad_batches = max(1, int(accumulate_grad_batches))
        self.tx = make_adam(learning_rate, betas=(0.5, 0.9),
                            accumulate_grad_batches=self.accumulate_grad_batches)
        raw_step = make_vae_train_step(vae, loss)
        # donate the states so queued async steps reuse buffers instead of
        # holding a full extra state generation each (deep dispatch queues
        # otherwise exhaust HBM and throttle). Virtual CPU devices don't
        # support donation -> gate on real TPU, mirroring train/step.py.
        donate = (0, 1) if jax.default_backend() == "tpu" else ()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._rep = rep
            self.train_step = jax.jit(
                raw_step, in_shardings=(rep, rep, {"image": data}, rep),
                out_shardings=(rep, rep, rep), donate_argnums=donate)
        else:
            self._rep = None
            self.train_step = jax.jit(raw_step, donate_argnums=donate)
        self.eval_step = jax.jit(make_vae_eval_step(vae, loss))
        self.gen_state: Optional[TrainState] = None
        self.disc_state: Optional[TrainState] = None

    def init_states(self, example_batch: Dict[str, np.ndarray]):
        mel = jnp.asarray(example_batch["image"])
        k1, k2, k3 = jax.random.split(self.key, 3)
        vae_params = jax.jit(self.vae.init)(
            {"params": k1, "gaussian": k2}, mel)
        loss_params = self.loss.init(k3, mel, method="disc_forward")
        self.gen_state = TrainState.create(vae_params, self.tx)
        self.disc_state = TrainState.create(loss_params, self.tx)
        if self._rep is not None:
            self.gen_state = jax.device_put(self.gen_state, self._rep)
            self.disc_state = jax.device_put(self.disc_state, self._rep)

    def save_checkpoint(self, name: str):
        state = {"gen": self.gen_state, "disc": self.disc_state}
        self.ckpt.save_last(state, self.global_step)

    def fit(self, datamodule, resume: bool = False):
        self._dispatch("on_fit_start")
        train_loader = datamodule.train_dataloader()
        try:
            val_loader = datamodule.val_dataloader()
        except Exception:
            val_loader = None
        try:
            for epoch in range(self.max_epochs):
                self._dispatch("on_epoch_start", epoch)
                for batch in train_loader:
                    batch = pad_batch_time(batch, self.time_bucket)
                    if self.gen_state is None:
                        self.init_states(batch)
                        if resume:
                            restored = self.ckpt.restore_last(
                                {"gen": self.gen_state, "disc": self.disc_state})
                            if restored is not None:
                                self.gen_state = restored["gen"]
                                self.disc_state = restored["disc"]
                                self.global_step = self.ckpt.last_step()
                                print(f"Resumed at step {self.global_step}")
                    self.key, k = jax.random.split(self.key)
                    self.gen_state, self.disc_state, metrics = self.train_step(
                        self.gen_state, self.disc_state,
                        {"image": jnp.asarray(batch["image"])}, k)
                    # host-side counter — int(gen_state.step) would block the
                    # async dispatch every step (device sync + RPC per step)
                    self.global_step += 1
                    self.log_metrics(metrics, self.global_step, "train/")
                    self._dispatch("on_train_batch_end", batch, metrics,
                                   self.global_step)
                    if self._sig_save:
                        self.save_checkpoint("last")
                        self._sig_save = False
                    if self.global_step >= self.max_steps:
                        break
                self._dispatch("on_epoch_end", epoch)
                if val_loader and (epoch + 1) % self.val_every_n_epochs == 0:
                    # Lightning check_val_every_n_epoch semantics:
                    # first validation after N epochs, not at epoch 0
                    vals = []
                    for vb in val_loader:
                        vb = pad_batch_time(vb, self.time_bucket)
                        self.key, k = jax.random.split(self.key)
                        vals.append(self.eval_step(
                            self.gen_state.params, self.disc_state.params,
                            {"image": jnp.asarray(vb["image"])}, k))
                    agg = {k: float(np.mean([np.asarray(v[k]) for v in vals]))
                           for k in vals[0]} if vals else {}
                    self.log_metrics(agg, self.global_step, "")
                    self.ckpt.save_monitored(
                        {"gen": self.gen_state, "disc": self.disc_state},
                        self.global_step, agg)
                self.save_checkpoint("last")
                if self.global_step >= self.max_steps:
                    break
        except KeyboardInterrupt:
            self._dispatch("on_exception")
            raise

    def test(self, datamodule):
        """Post-fit test pass (``autoencoder1d.py:111-135``): reconstruction
        MSE + per-item recon npy dumps under ``<logdir>/output_imgs``."""
        try:
            loader = datamodule.test_dataloader()
        except Exception:
            print("no test split configured")
            return {}
        savedir = os.path.join(self.logdir, "output_imgs", "fake_class")
        os.makedirs(savedir, exist_ok=True)
        mses, count = [], 0
        for batch in loader:
            batch = pad_batch_time(batch, self.time_bucket)
            mel = jnp.asarray(batch["image"])
            self.key, k = jax.random.split(self.key)
            recon, _ = self.vae.apply(self.gen_state.params, mel,
                                      rngs={"gaussian": k})
            mses.append(float(jnp.mean((recon - mel) ** 2)))
            names = batch.get("f_name") or batch.get("name") or \
                [str(count + i) for i in range(mel.shape[0])]
            for b, name in enumerate(names):
                s = str(name)  # strip a trailing _<idx> only when present
                base = s[: s.rfind("_")] if "_" in s else s
                np.save(os.path.join(savedir, f"{base}.npy"),
                        np.asarray(recon[b]))
                count += 1
        metrics = {"test/mse_loss": float(np.mean(mses)) if mses else 0.0}
        self.log_metrics(metrics, self.global_step, "")
        print(f"test: {count} reconstructions -> {savedir}, "
              f"mse={metrics['test/mse_loss']:.5f}")
        return metrics

    def log_images(self, batch) -> Dict[str, np.ndarray]:
        """inputs / reconstructions / prior samples (``autoencoder1d.py:
        155-162``)."""
        if self.gen_state is None:
            return {}
        mel = jnp.asarray(batch["image"])
        self.key, k = jax.random.split(self.key)
        recon, post = self.vae.apply(self.gen_state.params, mel,
                                     rngs={"gaussian": k})
        z = jax.random.normal(k, post.mode().shape)
        samples = self.vae.apply(self.gen_state.params, z, method="decode")
        return {"inputs": np.asarray(mel), "reconstructions": np.asarray(recon),
                "samples": np.asarray(samples)}


class CFMTrainer(BaseTrainer):
    """Stage-2 trainer: CFM loss over frozen-VAE latents with text/midi/beats
    conditioning (``ddpm_audio.py:418-441``, ``cfm1_audio.py:38-63``)."""

    def __init__(self, cfm, vae_params, cond_stage, learning_rate: float,
                 grad_clip: float = 1.0, use_ema: bool = False,
                 scheduler=None, mesh=None, accumulate_grad_batches: int = 1,
                 steps_per_call: int = 1, prefetch_groups: int = 1,
                 transfer_dtype: Optional[str] = None,
                 dedupe_captions: bool = True,
                 caption_cache_dir: Optional[str] = None, **kw):
        super().__init__(**kw)
        from versband_tpu.train.state import make_adamw
        from versband_tpu.train.step import (make_cfm_multi_step,
                                             make_cfm_train_step)

        self.cfm = cfm
        self.vae_params = vae_params
        self.cond_stage = cond_stage
        self.accumulate_grad_batches = max(1, int(accumulate_grad_batches))
        lr = learning_rate if scheduler is None else (
            lambda step: learning_rate * scheduler(step))
        self.tx = make_adamw(lr, grad_clip=grad_clip,
                             accumulate_grad_batches=self.accumulate_grad_batches)
        self.use_ema = use_ema
        self.mesh = mesh  # jax.sharding.Mesh -> pjit over (data, model)
        # vae_params travel as a jit argument (not closure constants)
        self._raw_step = make_cfm_train_step(
            cfm, accumulate_grad_batches=self.accumulate_grad_batches)
        # donate the state (see VAETrainer): without it, N queued async steps
        # pin N full param+opt-state generations (~1 GB each at the shipped
        # geometry) and the dispatch queue throttles on HBM pressure —
        # measured 1.7 s/step vs 188 ms/step synced (docs/BENCH_NOTES.md).
        donate = (0,) if jax.default_backend() == "tpu" else ()
        self.train_step = (jax.jit(self._raw_step, donate_argnums=donate)
                           if mesh is None else None)
        # steps_per_call > 1: fuse K steps into one lax.scan program (one
        # dispatch + one metrics readback per K steps) — pays off wherever
        # per-program launch latency is comparable to step time. Single-chip
        # only; the mesh path keeps per-step dispatch. jax.jit is lazy, so
        # the unused variant costs no compile time.
        self.steps_per_call = max(1, int(steps_per_call)) if mesh is None else 1
        self._multi_step = (
            jax.jit(make_cfm_multi_step(
                cfm, accumulate_grad_batches=self.accumulate_grad_batches),
                donate_argnums=donate)
            if self.steps_per_call > 1 else None)
        self._group: list = []
        self._place_state = self._place_batch = None
        self._val_step = None
        self.state: Optional[TrainState] = None
        # input pipeline: while the device executes step/group k, ONE worker
        # thread assembles + transfers k+1 (caption encode, np.stack, h2d —
        # all RPC-wait-heavy through a tunneled device, so it overlaps real
        # device compute even on a 1-core host). Mesh runs keep the inline
        # path: shard placement is set up lazily inside dispatch.
        self._prefetch = max(0, int(prefetch_groups)) if mesh is None else 0
        self._xfer_pool = None
        self._inflight: list = []
        self._fed_steps = 0
        # 'float16' halves mel h2d bytes (ids go int16); the step widens them
        # back on device (train/step.py::_decompress_batch). None = exact.
        assert transfer_dtype in (None, "float16"), transfer_dtype
        self.transfer_dtype = transfer_dtype
        # encode only the UNIQUE captions of a fused group (CFG dropout and
        # finite template pools make duplicates common) and gather rows back
        # on device — same values, fewer frozen-tower rows
        self.dedupe_captions = bool(dedupe_captions)
        # persistent embedding cache for the FROZEN tower — OPT-IN, for
        # datasets whose caption set is small and fixed (precomputed prompt
        # lists, eval sweeps): a full hit is one on-device stack+gather and
        # the tower program leaves the chip. Default OFF because the shipped
        # vocal2accomp dataset draws captions from randomized templates per
        # ACCESS (~60 distinct per 64-row group, ~95% never seen before —
        # measured, docs/BENCH_NOTES.md "Caption cache"), so the cache never
        # warms and its miss-side costs (per-row slice dispatches, a full
        # d2h readback per group for the disk tier, one npy write per new
        # caption) sink loader-fed throughput 12.6 -> 1.9 steps/s on the
        # v5e. The RAM tier holds DEVICE arrays: a host-side cache would
        # trade the tower for a ~2.6 MB/batch h2d re-upload through the
        # tunnel, which is SLOWER than the encode it saves (measured
        # 10.1 -> 2.1 steps/s). 'auto' scopes the cache to the run's logdir
        # (same logdir == same tower config, so no cross-model poisoning).
        if caption_cache_dir == "auto":
            caption_cache_dir = os.path.join(self.logdir, "caption_cache")
        self._cap_cache_dir = caption_cache_dir if cond_stage is not None \
            else None
        self._cap_cache: Dict[str, Any] = {}  # caption -> [L, D] device row
        self._cap_cache_cap = 4096  # ~1.3 GB HBM at [80,1024] fp32; the
        # disk tier below is unbounded and re-seeds evicted rows on demand
        # miss rows ride to the host ASYNCHRONOUSLY (copy_to_host_async at
        # encode time, materialized one group later) — a blocking np.asarray
        # on the tower output would serialize the prefetch thread on a d2h
        # RPC through the tunnel every group (measured 10.1 -> 3.9 steps/s)
        self._cap_pending: list = []
        if self._cap_cache_dir is not None:
            os.makedirs(self._cap_cache_dir, exist_ok=True)

    def _cache_lookup(self, cap: str):
        """Device row for ``cap``, or None. Disk hits upload once per
        process (one h2d per caption ever, amortized across all epochs)."""
        hit = self._cap_cache.get(cap)
        if hit is not None:
            return hit
        if self._cap_cache_dir is None:
            return None
        import hashlib

        path = os.path.join(self._cap_cache_dir,
                            hashlib.sha1(cap.encode()).hexdigest() + ".npy")
        if os.path.exists(path):
            try:
                hit = jnp.asarray(np.load(path))
            except Exception:
                return None  # partial write from a crashed run: re-encode
            self._cache_remember(cap, hit)
        return hit

    def _cache_remember(self, cap: str, emb):
        if len(self._cap_cache) >= self._cap_cache_cap:
            # pop(key, None): the prefetch thread and a main-thread
            # log_images encode can evict concurrently
            self._cap_cache.pop(next(iter(self._cap_cache), None), None)
        self._cap_cache[cap] = emb

    def _cache_flush_pending(self):
        """Write the previous groups' miss rows to the DISK tier — their
        async d2h has had a full group of device time to complete, so the
        np.asarray here is (close to) a no-wait read. RAM already holds the
        device rows; overwriting them with host copies would put the h2d
        back on the hot path."""
        pending, self._cap_pending = self._cap_pending, []
        for texts, enc in pending:
            arr = np.asarray(enc)
            for t, e in zip(texts, arr):
                self._disk_store(t, e)

    def _disk_store(self, cap: str, emb: np.ndarray):
        import hashlib

        path = os.path.join(
            self._cap_cache_dir,
            hashlib.sha1(cap.encode()).hexdigest() + ".npy")
        # tmp must end in .npy: np.save appends the suffix otherwise and
        # os.replace would miss the actual file written
        tmp = f"{path}.tmp{os.getpid()}.npy"
        try:
            np.save(tmp, np.asarray(emb))
            os.replace(tmp, path)  # atomic: concurrent ranks are safe
        except OSError:
            pass  # cache write failure must never kill training

    def _encode_captions(self, batch):
        captions = batch["caption"]["caption"]
        if self.cond_stage is None:  # pre-encoded or test mode
            # same wire compression as the fused-group path so caption
            # precision does not depend on steps_per_call
            return self._compress(np.asarray(captions))
        # stays a device array: np.asarray here would force a blocking
        # device->host->device round-trip per batch (an extra RPC through
        # the axon tunnel on top of the transfer)
        return self._encode_caption_list(list(captions))

    def _encode_caption_list(self, caps):
        """Frozen-tower encode with duplicate collapsing.

        The frozen tower is row-independent (all-ones attention mask,
        max_length padding), so encoding each distinct string once and
        gathering rows back by index returns the same embeddings while
        cutting tower rows by the duplicate rate. Unique counts are padded
        to a power-of-two bucket so the jitted tower compiles O(log B)
        shapes, not one per duplicate pattern.
        """
        n = len(caps)
        if self._cap_cache_dir is not None or (self.dedupe_captions and n > 1):
            idx_of: Dict[str, int] = {}
            inv = np.empty((n,), np.int32)
            uniq = []
            for i, c in enumerate(caps):
                j = idx_of.setdefault(c, len(uniq))
                if j == len(uniq):
                    uniq.append(c)
                inv[i] = j
            if self._cap_cache_dir is not None:
                self._cache_flush_pending()
                rows = [self._cache_lookup(c) for c in uniq]
                miss = [k for k, r in enumerate(rows) if r is None]
                if miss:
                    texts = [uniq[k] for k in miss]
                    bucket = 1
                    while bucket < len(texts):
                        bucket *= 2
                    padded = texts + [texts[-1]] * (bucket - len(texts))
                    enc = self.cond_stage(
                        {"caption": padded, "acoustic": {}})["caption"]
                    # disk fill is off the hot path: start the d2h now, read
                    # it back next group when the transfer has completed
                    try:
                        enc.copy_to_host_async()
                    except AttributeError:
                        pass
                    self._cap_pending.append((texts, enc))
                    # RAM keeps lazy DEVICE slices — never a host round-trip
                    for pos_k, k in enumerate(miss):
                        rows[k] = enc[pos_k]
                        self._cache_remember(uniq[k], rows[k])
                    if len(miss) == len(uniq):
                        # cold group (epoch 0): exactly the r4 dedup plan —
                        # one device-side gather, zero extra dispatches
                        return enc[:len(miss)][jnp.asarray(inv)]
                # hit/mixed: on-device stack of cached rows + gather — the
                # tower runs only on the miss rows, nothing crosses the wire
                return jnp.stack(rows)[jnp.asarray(inv)]
            bucket = 1
            while bucket < len(uniq):
                bucket *= 2
            if bucket < n:
                uniq = uniq + [uniq[-1]] * (bucket - len(uniq))
                enc = self.cond_stage({"caption": uniq,
                                       "acoustic": {}})["caption"]
                return jnp.asarray(enc)[jnp.asarray(inv)]
        return self.cond_stage({"caption": caps, "acoustic": {}})["caption"]

    def _compress(self, a):
        """Wire compression for h2d.

        Integer ids ALWAYS ship as int16 — midi vocab 130, beats 3: the cast
        is value-preserving, a pure 4x bandwidth win over int64 (the step
        widens them back on device). Floats only under the opt-in lossy
        ``transfer_dtype`` (fp16 rounds the input mels by ~6e-4 relative).
        """
        arr = np.asarray(a)
        if arr.dtype in (np.int32, np.int64):
            return arr.astype(np.int16)
        if self.transfer_dtype is not None and arr.dtype == np.float32:
            return arr.astype(np.float16)
        return a

    def _device_batch(self, batch) -> Dict[str, Any]:
        return {
            "image": jnp.asarray(self._compress(batch["image"])),
            "caption": jnp.asarray(self._encode_captions(batch)),
            "midi": jnp.asarray(self._compress(
                batch["caption"]["acoustic"]["midi"])),
            "beats": jnp.asarray(self._compress(
                batch["caption"]["acoustic"]["beats"])),
        }

    def init_state(self, example_batch: Dict[str, Any]):
        from versband_tpu.train.step import _decompress_batch

        # widen any wire-compressed arrays: scale_by_std and the init trace
        # must see compute dtypes
        db = _decompress_batch(self._device_batch(example_batch))
        B, _, T = db["image"].shape
        # downsample factor from the VAE config (setup() attrs aren't visible
        # outside apply on flax modules)
        down_layers = (self.cfm.first_stage.ddconfig or {}).get("down_layers", (0,))
        T_lat = T // (2 ** len(down_layers))
        x = jnp.zeros((B, self.cfm.mel_dim, T_lat))
        t = jnp.zeros((B,), jnp.int32)
        from versband_tpu.models.cfm import _cond_to_context

        ctx = _cond_to_context({"caption": db["caption"],
                                "acoustic": {"midi": db["midi"],
                                             "beats": db["beats"]}})
        k1, k2 = jax.random.split(self.key)
        params = jax.jit(lambda: self.cfm.model.init(
            {"params": k1, "gumbel": k2}, x, t, ctx, train=True))()
        self.state = TrainState.create(
            params, self.tx, ema_decay=0.9999 if self.use_ema else None)

        # scale_by_std from the first batch (ddpm_audio.py:89-104)
        if self.cfm.scale_by_std and self.cfm.scale_factor == 1.0:
            self.cfm.compute_scale_factor(self.vae_params, db["image"], k2)
            print(f"setting scale_factor to {self.cfm.scale_factor:.5f}")

    def save_checkpoint(self, name: str):
        # persist the scale_by_std factor (a checkpoint buffer in the
        # reference) so resume/inference decode at the trained latent scale
        self.ckpt.save_last(self.state, self.global_step,
                            extra={"scale_factor": self.cfm.scale_factor})

    def fit(self, datamodule, resume: bool = False):
        self._dispatch("on_fit_start")
        train_loader = datamodule.train_dataloader()
        try:
            val_loader = datamodule.val_dataloader()
        except Exception:
            val_loader = None
        self._fed_steps = self.global_step
        if self._prefetch and self._xfer_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            # one worker per prefetched group: assembly is dominated by RPC
            # waits (h2d acks, tower dispatch) that release the GIL, so two
            # workers overlap two groups' waits even on a 1-core host;
            # dispatch order stays FIFO via the _inflight queue regardless
            # of which assembly finishes first
            self._xfer_pool = ThreadPoolExecutor(
                max(1, self._prefetch), thread_name_prefix="cfm-xfer")
        try:
            for epoch in range(self.max_epochs):
                self._dispatch("on_epoch_start", epoch)
                for batch in train_loader:
                    batch = pad_batch_time(
                        {**batch, "midi": batch["caption"]["acoustic"]["midi"],
                         "beats": batch["caption"]["acoustic"]["beats"]},
                        self.time_bucket) | {"caption": batch["caption"]}
                    batch["caption"]["acoustic"]["midi"] = batch["midi"]
                    batch["caption"]["acoustic"]["beats"] = batch["beats"]
                    if self.state is None:
                        self.init_state(batch)
                        if resume:
                            restored = self.ckpt.restore_last(self.state)
                            if restored is not None:
                                self.state = restored
                                meta = self.ckpt.last_meta()
                                self.global_step = int(meta.get("step", 0))
                                self._fed_steps = self.global_step
                                if "scale_factor" in meta:
                                    # override the value init_state recomputed
                                    # from THIS run's first batch
                                    self.cfm.scale_factor = float(
                                        meta["scale_factor"])
                                print(f"Resumed at step {self.global_step}")
                    # flush early if any padded shape changed (stacking
                    # needs uniform shapes across the group) — captions
                    # can vary in length independently of the mel bucket
                    if (self.steps_per_call > 1 and self._group
                            and self._group_sig(self._group[0])
                            != self._group_sig(batch)):
                        self._flush_group()
                    self._group.append(batch)
                    # never fuse past max_steps: flush a short group at
                    # the boundary so global_step lands exactly on it
                    if (len(self._group) >= self.steps_per_call
                            or self._fed_steps + len(self._group)
                            >= self.max_steps):
                        self._flush_group()
                        if self._fed_steps >= self.max_steps:
                            self._drain()
                    if self._sig_save:
                        self._drain()
                        self.save_checkpoint("last")
                        self._sig_save = False
                    if self.global_step >= self.max_steps:
                        break
                self._flush_group()
                self._drain()
                self._dispatch("on_epoch_end", epoch)
                if val_loader and (epoch + 1) % self.val_every_n_epochs == 0:
                    # Lightning check_val_every_n_epoch semantics:
                    # first validation after N epochs, not at epoch 0
                    self._validate(val_loader)
                self.save_checkpoint("last")
                self.ckpt.save_step_archive(self.state, self.global_step)
                if self.global_step >= self.max_steps:
                    break
        except KeyboardInterrupt:
            self._dispatch("on_exception")
            raise
        finally:
            if self._xfer_pool is not None:
                self._xfer_pool.shutdown(wait=False, cancel_futures=True)
                self._xfer_pool = None
                self._inflight.clear()
            if self._cap_pending:  # last group's miss rows still in flight
                self._cache_flush_pending()

    def _run_single(self, batch):
        self._dispatch_single(self._device_batch(batch), batch)

    def _dispatch_single(self, db, batch):
        if self.mesh is not None and self.train_step is None:
            from versband_tpu.train.step import shard_train_step

            with self.mesh:
                (self.train_step, self._place_state,
                 self._place_batch) = shard_train_step(
                    self._raw_step, self.state, db, self.mesh)
                self.state = self._place_state(self.state)
        if self._place_batch is not None:
            db = self._place_batch(db)
        self.key, k = jax.random.split(self.key)
        self.state, metrics = self.train_step(
            self.state, db, k, self.vae_params)
        # host-side step counter: int(state.step) would BLOCK on the async
        # dispatch every step (one device sync + RPC round-trip per step
        # through the axon tunnel)
        self.global_step += 1
        self.log_metrics(metrics, self.global_step, "train/")
        self._dispatch("on_train_batch_end", batch, metrics,
                       self.global_step)

    def _group_sig(self, batch):
        """Shape signature a fused group must hold constant for np.stack."""
        cap = batch["caption"]["caption"]
        return (np.asarray(batch["image"]).shape,
                np.asarray(cap).shape if self.cond_stage is None else None,
                np.asarray(batch["caption"]["acoustic"]["midi"]).shape)

    def _flush_group(self):
        """Feed the buffered batches to the pipeline (or dispatch inline)."""
        group, self._group = self._group, []
        if not group:
            return
        self._fed_steps += len(group)
        if len(group) == 1:
            assemble = (lambda: self._device_batch(group[0]))
            dispatch = (lambda db: self._dispatch_single(db, group[0]))
        else:
            assemble = (lambda: self._assemble_group(group))
            dispatch = (lambda db: self._dispatch_group(db, group))
        if self._xfer_pool is None:
            dispatch(assemble())
            return
        self._inflight.append((self._xfer_pool.submit(assemble), dispatch))
        while len(self._inflight) > self._prefetch:
            self._dispatch_next()

    def _dispatch_next(self):
        fut, dispatch = self._inflight.pop(0)
        dispatch(fut.result())

    def _drain(self):
        """Dispatch every in-flight assembled batch (global_step catches up
        to _fed_steps) — called at epoch/max_steps/checkpoint boundaries."""
        while self._inflight:
            self._dispatch_next()

    def _assemble_group(self, group):
        """Host->device assembly of one fused K-step batch (runs on the
        transfer thread when pipelining: caption encode + stack + h2d all
        overlap the previous fused program's device execution)."""
        K = len(group)
        if self.cond_stage is None:
            caption = jnp.asarray(self._compress(np.stack(
                [np.asarray(b["caption"]["caption"]) for b in group])))
        else:
            # ONE text-encoder program for all K batches (deduped)
            caps = [c for b in group for c in list(b["caption"]["caption"])]
            enc = jnp.asarray(self._encode_caption_list(caps))
            caption = enc.reshape((K, -1) + enc.shape[1:])
        return {
            "image": jnp.asarray(self._compress(
                np.stack([b["image"] for b in group]))),
            "caption": caption,
            "midi": jnp.asarray(self._compress(np.stack(
                [b["caption"]["acoustic"]["midi"] for b in group]))),
            "beats": jnp.asarray(self._compress(np.stack(
                [b["caption"]["acoustic"]["beats"] for b in group]))),
        }

    def _dispatch_group(self, db, group):
        self.key, k = jax.random.split(self.key)
        self.state, ms = self._multi_step(self.state, db, k, self.vae_params)
        self.global_step += len(group)
        last = {kk: vv[-1] for kk, vv in ms.items()}
        self.log_metrics(last, self.global_step, "train/")
        # callbacks fire once per fused program with the last batch/metrics
        self._dispatch("on_train_batch_end", group[-1], last,
                       self.global_step)

    def log_images(self, batch) -> Dict[str, np.ndarray]:
        """inputs / samples for the Image/AudioLogger callbacks
        (``ddpm_audio.py:747-863`` subset: gt mel + CFM sample decoded)."""
        if self.state is None:
            return {}
        from versband_tpu.train.step import _decompress_batch

        # sampling/logging consumes the arrays directly (no train step to
        # widen them): undo any wire compression first
        db = _decompress_batch(self._device_batch(batch))
        self.key, k = jax.random.split(self.key)
        cond = {"caption": db["caption"],
                "acoustic": {"midi": db["midi"], "beats": db["beats"]}}
        B = min(int(db["image"].shape[0]), 4)
        cond = jax.tree_util.tree_map(lambda x: x[:B], cond)
        z = self.cfm.sample_cfg(self.state.params, cond, 1.0, None, k,
                                batch_size=B)
        mel = self.cfm.decode_first_stage(self.vae_params, z)
        return {"inputs": np.asarray(db["image"][:B]),
                "samples": np.asarray(mel)}

    def test(self, datamodule):
        """Post-fit test pass (``ddpm_audio.py:423-430``): sample + decode per
        test item, saving mels under ``<logdir>/output_samples``."""
        try:
            loader = datamodule.test_dataloader()
        except Exception:
            print("no test split configured")
            return {}
        savedir = os.path.join(self.logdir, "output_samples")
        os.makedirs(savedir, exist_ok=True)
        count = 0
        for batch in loader:
            images = self.log_images(batch)
            for b in range(images["samples"].shape[0]):
                np.save(os.path.join(savedir, f"sample_{count:05d}.npy"),
                        images["samples"][b])
                count += 1
        print(f"test: {count} samples -> {savedir}")
        return {"test/num_samples": count}

    def _validate(self, val_loader):
        """Eval-mode validation under EMA weights when enabled.

        Matches Lightning eval semantics (``ddpm.py:357-364``): the module
        runs in eval mode — hard MoE routing, NO Gumbel noise
        (``train=False``) — so ``val/loss_simple`` is a deterministic function
        of (params, batch, t, noise). t/noise/encode keys come from a fixed
        per-batch-index key, making the metric comparable across epochs.
        """
        params = (self.state.ema.copy_to(self.state.params)
                  if (self.use_ema and self.state.ema is not None)
                  else self.state.params)
        if self._val_step is None:
            from versband_tpu.models.cfm import cfm_p_losses

            cfm = self.cfm

            def _vstep(params, vae_params, mel, cond, key):
                k_enc, k_t, k_noise = jax.random.split(key, 3)
                z = cfm.encode_first_stage(vae_params, mel, k_enc)
                t = jax.random.randint(k_t, (z.shape[0],), 0,
                                       cfm.num_timesteps)
                noise = jax.random.normal(k_noise, z.shape, z.dtype)
                return cfm_p_losses(
                    cfm.model.apply, params, z, cond, t, noise,
                    sigma_min=cfm.sigma_min,
                    num_timesteps=cfm.num_timesteps,
                    l_simple_weight=cfm.l_simple_weight,
                    gumbel_rng=None)  # eval mode: hard routing, no Gumbel

            self._val_step = jax.jit(_vstep)
        losses = []
        for i, vb in enumerate(val_loader):
            vb = pad_batch_time(
                {**vb, "midi": vb["caption"]["acoustic"]["midi"],
                 "beats": vb["caption"]["acoustic"]["beats"]},
                self.time_bucket) | {"caption": vb["caption"]}
            vb["caption"]["acoustic"]["midi"] = vb["midi"]
            vb["caption"]["acoustic"]["beats"] = vb["beats"]
            from versband_tpu.train.step import _decompress_batch

            # _vstep consumes the arrays directly: widen any wire compression
            db = _decompress_batch(self._device_batch(vb))
            cond = {"caption": db["caption"],
                    "acoustic": {"midi": db["midi"], "beats": db["beats"]}}
            k = jax.random.fold_in(jax.random.PRNGKey(17), i)
            loss, parts = self._val_step(params, self.vae_params,
                                         db["image"], cond, k)
            # monitor the pure flow-matching mse (the reference's
            # val/loss_simple), not the total contaminated by the MoE
            # load-balance term
            losses.append(float(parts["loss_simple"]))
        suffix = "_ema" if self.use_ema else ""
        agg = {f"val/loss_simple{suffix}": float(np.mean(losses))}
        self.log_metrics(agg, self.global_step, "")
        self.ckpt.save_monitored(self.state, self.global_step, agg)
