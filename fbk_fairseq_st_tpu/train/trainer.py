"""Trainer: one pjit-sharded jitted train step.

Counterpart of fairseq/trainer.py:28-803, redesigned for SPMD:

  * the reference's DDP wrapper + no_sync grad accumulation + multiply_grads
    (world/sample_size) + clip + step pipeline becomes a single compiled
    function: loss and sample_size reduce over the *global* (data-sharded)
    batch, gradients are normalized by global sample_size and clipped inside
    the same graph — identical math to trainer.py:423-443 with zero explicit
    communication;
  * --update-freq microbatches accumulate grads across jitted
    forward/backward calls and apply once (the reference's GroupedIterator +
    no_sync path, trainer.py:359-375);
  * fp16 loss-scaling disappears: compute runs in bf16 (same exponent range
    as fp32), params/optimizer state stay fp32 — the FP16Optimizer
    master-copy layout without a loss scaler;
  * the per-update RNG fold-in reproduces seed-per-update
    (trainer.py:655-661);
  * the cross-worker grad-norm consistency check (trainer.py:764-774) is
    structurally impossible to violate under SPMD (one program, one grad);
    NaN/Inf detection raises FloatingPointError like the reference
    NanDetector path.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.core import RngStream
from ..parallel.mesh import (
    batch_sharding,
    make_mesh,
    place_global_array,
    replicated,
    shard_batch,
)
from ..registry import LR_SCHEDULERS, OPTIMIZERS
from . import metrics

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, args, task, model, criterion, mesh=None,
                 quantizer=None):
        self.args = args
        self.task = task
        self.model = model
        self.criterion = criterion
        self.quantizer = quantizer
        world = getattr(args, "distributed_world_size", None)
        self.mesh = mesh if mesh is not None else make_mesh(
            devices=jax.devices()[:world] if world else None,
            model=getattr(args, "model_parallel_size", 1) or 1,
            dcn=getattr(args, "dcn_data_parallel", 1) or 1,
        )

        self.compute_dtype = (
            jnp.bfloat16
            if getattr(args, "bf16", False)
            or getattr(args, "fp16", False)
            or getattr(args, "memory_efficient_fp16", False)
            else jnp.float32
        )

        # optimizer + scheduler
        self.tx = OPTIMIZERS[args.optimizer].build_optimizer(args)
        self.lr_scheduler = LR_SCHEDULERS[args.lr_scheduler].build_lr_scheduler(args)

        # state
        seed = getattr(args, "seed", 1)
        # rbg uses the TPU hardware RNG for dropout masks — threefry spends
        # more step time generating random bits than the matmuls of a small
        # model (measured 49ms->26ms per step on the bench config); threefry
        # remains available for bitwise cross-backend reproducibility
        prng_impl = getattr(args, "prng_impl", "rbg") or "rbg"
        # typed key: carries its impl through jit/fold_in regardless of the
        # ambient default
        self._root_key = jax.random.key(seed, impl=prng_impl)
        # --fixed-validation-seed (reference fairseq_cli/train.py:262-264):
        # every validation pass sees the same RNG regardless of --seed,
        # making valid losses comparable across runs; built once here (key
        # construction is a device op — per-batch would round-trip the
        # tunneled host)
        fvs = getattr(args, "fixed_validation_seed", None)
        self._valid_key = (
            jax.random.key(int(fvs), impl=prng_impl)
            if fvs is not None
            else self._root_key
        )
        variables = model.init(jax.random.fold_in(self._root_key, 0))
        opt_state = self.tx.init(variables["params"])
        self.train_state: Dict[str, Any] = {
            "params": variables["params"],
            "model_state": variables["state"],
            "opt_state": opt_state,
        }
        # place state on the mesh: params follow the Megatron-style TP rules
        # when the 'model' axis is >1, everything else is replicated; GSPMD
        # propagates these shardings through the train step and inserts the
        # collectives (grad all-reduce over 'data', activation collectives
        # over 'model')
        use_tp = self.mesh.shape.get("model", 1) > 1
        # ZeRO-3: shard params (and through _opt_state_sharding the
        # optimizer moments) over the 'data' axis; GSPMD inserts the
        # per-use all-gathers and grad reduce-scatters
        use_fsdp = bool(getattr(args, "fsdp", False))
        # Megatron-SP (arXiv:2205.05198, the GSPMD formulation — see
        # parallel/mesh.py): time-shard the LN/dropout/residual segments
        # over the 'model' axis during training traces
        self._seq_parallel = bool(
            getattr(args, "sequence_parallel", False)
        ) and self.mesh.shape.get("model", 1) > 1
        # context parallelism: self-attention runs sequence-sharded over
        # the 'model' axis with K/V rotating via ppermute (ring attention,
        # ops/ring_attention.py) — the full-length scores/K/V never
        # materialize on any device
        self._ring_attention = bool(
            getattr(args, "ring_attention", False)
        ) and self.mesh.shape.get("model", 1) > 1
        from ..parallel.mesh import param_sharding

        self._param_shard = param_sharding(
            self.mesh, variables["params"], use_tp=use_tp, use_fsdp=use_fsdp,
            fsdp_min_size=getattr(args, "fsdp_min_shard_size", None),
        )
        self._opt_shard = self._opt_state_sharding(
            opt_state, variables["params"], self._param_shard
        )
        self.train_state["params"] = jax.device_put(
            self.train_state["params"], self._param_shard
        )
        self.train_state["model_state"] = jax.device_put(
            self.train_state["model_state"], replicated(self.mesh)
        )
        self.train_state["opt_state"] = jax.device_put(
            self.train_state["opt_state"], self._opt_shard
        )

        self._num_updates = 0
        self.clip_norm = getattr(args, "clip_norm", 0.0) or 0.0
        self._dummy_count = 0
        # >1 defers the device->host sync of logging outputs/gnorm to every
        # N updates, letting the host enqueue the next step while the
        # current one runs (the reference syncs every step; NaN detection
        # then also runs on this cadence)
        self.log_sync_interval = max(
            int(getattr(args, "log_sync_interval", 1) or 1), 1
        )
        # K>1 fuses K optimizer updates into one compiled dispatch
        # (lax.scan over K stacked batches) — amortizes the per-step host
        # dispatch latency (measured ~5 ms/step on a tunneled host, the
        # entire wall-vs-device MFU gap in PERF.md §1)
        self.steps_per_execution = max(
            int(getattr(args, "steps_per_execution", 1) or 1), 1
        )
        self._pending_logs: list = []
        self.bmuf = None
        if getattr(args, "use_bmuf", False):
            from ..optim.bmuf import BMUF

            self.bmuf = BMUF(args)

        # frozen-parameter mask (models loading pretrained components expose
        # frozen_param_filter; reference freeze semantics
        # conv_transformer.py:114-121, conv_transformer_context.py:88-96)
        self._build_grad_mask()

        self._fused_step = jax.jit(
            self._fused_step_impl, donate_argnums=(0,),
        )
        self._grad_step = jax.jit(self._grad_step_impl)
        self._multi_step = jax.jit(self._multi_step_impl, donate_argnums=(0,))
        self._apply_step = jax.jit(self._apply_step_impl, donate_argnums=(0, 1))
        self._jit_valid = jax.jit(self._valid_impl)

        self.lr_scheduler.step_update(0)
        metrics.log_start_time("wall", priority=790, round=0)

    def _opt_state_sharding(self, opt_state, params, p_shard):
        """Sharding tree for the optimizer state: moment trees (adam mu/nu,
        etc.) mirror the param tree, so any opt-state leaf whose path ends
        with a param's path and matches its shape inherits that param's TP
        sharding; everything else (step counters, factored adafactor stats)
        is replicated. Matches Megatron's partition-per-rank optimizer state
        (reference model_parallel/megatron_trainer.py:26-62) without
        explicit per-rank checkpoint files."""
        from ..parallel.mesh import _path_str

        flat_params = jax.tree_util.tree_leaves_with_path(params)
        flat_shard = jax.tree_util.tree_leaves(
            p_shard, is_leaf=lambda x: hasattr(x, "spec")
        )
        entries = [
            (_path_str(path), leaf.shape, sh)
            for (path, leaf), sh in zip(flat_params, flat_shard)
        ]
        repl = replicated(self.mesh)

        def place(path, leaf):
            if not hasattr(leaf, "shape"):
                return repl
            s = _path_str(path)
            for p_str, shape, sh in entries:
                if leaf.shape == shape and (
                    s == p_str or s.endswith("/" + p_str)
                ):
                    return sh
            return repl

        return jax.tree_util.tree_map_with_path(place, opt_state)

    # ------------------------------------------------------------------
    # jitted bodies
    # ------------------------------------------------------------------

    def _build_grad_mask(self) -> None:
        """Zero-update mask over frozen params: paths the model's
        frozen_param_filter rejects (reference freeze semantics,
        conv_transformer.py:114-121) and PQ assignment codes (``w_codes``
        leaves stay fixed; only centroids train — reference qlinear.py)."""
        from ..parallel.mesh import _path_str

        model_filter = getattr(self.model, "frozen_param_filter", None)

        def mask_leaf(path, leaf):
            name = _path_str(path)
            frozen = name.endswith("w_codes") or (
                model_filter is not None and model_filter(name)
            )
            return jnp.zeros_like(leaf) if frozen else jnp.ones_like(leaf)

        self._grad_mask = None
        if model_filter is not None or any(
            getattr(p, "key", None) == "w_codes"
            for path, _ in jax.tree_util.tree_flatten_with_path(
                self.train_state["params"]
            )[0]
            for p in path
        ):
            mask = jax.tree_util.tree_map_with_path(
                mask_leaf, self.train_state["params"]
            )
            if any(
                float(jnp.min(m)) == 0.0
                for m in jax.tree_util.tree_leaves(mask)
            ):
                self._grad_mask = mask

    def reinitialize(self, new_params) -> None:
        """Rebuild after a structural param change (reference
        trainer.reinitialize + quantization_utils.py:101): fresh optimizer
        state over the new tree, recomputed shardings, refreshed frozen
        mask. num_updates and LR-scheduler state carry over; the jitted
        step recompiles automatically for the new tree structure."""
        from ..parallel.mesh import param_sharding

        use_tp = self.mesh.shape.get("model", 1) > 1
        use_fsdp = bool(getattr(self.args, "fsdp", False))
        self._param_shard = param_sharding(
            self.mesh, new_params, use_tp=use_tp, use_fsdp=use_fsdp,
            fsdp_min_size=getattr(self.args, "fsdp_min_shard_size", None),
        )
        opt_state = self.tx.init(new_params)
        self._opt_shard = self._opt_state_sharding(
            opt_state, new_params, self._param_shard
        )
        self.train_state = {
            "params": jax.device_put(new_params, self._param_shard),
            "model_state": self.train_state["model_state"],
            "opt_state": jax.device_put(opt_state, self._opt_shard),
        }
        self._build_grad_mask()

    def _cast_batch(self, batch):
        for key in ("src_tokens", "source"):
            if key in batch:
                batch = dict(batch)
                # audio frontends take float features; text models take ids
                if jnp.issubdtype(batch[key].dtype, jnp.floating):
                    batch[key] = batch[key].astype(self.compute_dtype)
                return batch
        if all(isinstance(v, dict) for v in batch.values()):
            # nested multilingual batch
            return {k: self._cast_batch(v) for k, v in batch.items()}
        return batch

    def _loss_fn(self, params, model_state, batch, rng_key, update_seed):
        rng = RngStream(rng_key)
        batch = self._cast_batch(batch)
        batch = self.task.augment_batch(batch, rng)
        qns = float(getattr(self.args, "quant_noise_scalar", 0) or 0)
        if qns > 0:
            # --quant-noise-scalar: train against int8 rounding (reference
            # roberta/model.py quantize_model_ wrapping; here one STE pass
            # over the weight leaves inside the jitted step)
            from ..quantization.scalar import scalar_quant_noise_params

            params = scalar_quant_noise_params(params, rng.next(), qns)
        variables = {"params": params, "state": model_state}
        loss, sample_size, logging_output, new_state = self.criterion(
            self.model, variables, batch, rng=rng, training=True
        )
        return loss, (sample_size, logging_output, new_state)

    def _compute_grads(self, train_state, batch, rng_key):
        from ..ops.ring_attention import set_ring_attention
        from ..parallel.mesh import batch_axes, set_sequence_parallel

        # activate the sequence-parallel scope only while THIS trainer's
        # graph traces (jitted bodies run once per shape signature), so
        # other trainers / generators in the same process are untouched
        set_sequence_parallel(self.mesh if self._seq_parallel else None)
        set_ring_attention(
            self.mesh if self._ring_attention else None,
            batch_axis=batch_axes(self.mesh) if self._ring_attention
            else None,
        )
        try:
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (loss, (sample_size, logging_output, new_model_state)), grads = (
                grad_fn(
                    train_state["params"],
                    train_state["model_state"],
                    batch,
                    rng_key,
                    None,
                )
            )
        finally:
            set_sequence_parallel(None)
            set_ring_attention(None)
        return grads, loss, sample_size, logging_output, new_model_state

    def _apply_grads(self, train_state, grads, sample_size, lr, new_model_state):
        if self._grad_mask is not None:
            grads = jax.tree_util.tree_map(jnp.multiply, grads, self._grad_mask)
        # normalize by global sample_size (trainer.py:423-433)
        denom = jnp.maximum(sample_size.astype(jnp.float32), 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
        gnorm = optax.global_norm(grads)
        if self.clip_norm > 0:
            scale = jnp.minimum(1.0, self.clip_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt_state = self.tx.update(
            grads, train_state["opt_state"], train_state["params"]
        )
        if self._grad_mask is not None:
            # zeroed grads are not enough: transforms like
            # add_decayed_weights re-introduce wd*param into the update
            # stream, which would decay "frozen" weights — mask the final
            # updates as well (reference freeze = excluded from optimizer)
            updates = jax.tree_util.tree_map(
                jnp.multiply, updates, self._grad_mask
            )
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(train_state["params"], updates)
        return (
            {
                "params": new_params,
                "model_state": new_model_state,
                "opt_state": new_opt_state,
            },
            gnorm,
        )

    def _fused_step_impl(self, train_state, batch, lr, root_key, upd):
        # seed-per-update key derived IN-graph: a host-side fold_in would be
        # one extra tiny device op per step — each costs a full round-trip
        # on a tunneled host, and they (not dispatch itself) were measured
        # to be the entire wall-vs-device step-time gap (PERF.md §8)
        rng_key = jax.random.fold_in(root_key, upd + 1)
        grads, loss, sample_size, logging_output, new_model_state = (
            self._compute_grads(train_state, batch, rng_key)
        )
        new_state, gnorm = self._apply_grads(
            train_state, grads, sample_size, lr, new_model_state
        )
        return new_state, gnorm, logging_output

    def _grad_step_impl(self, train_state, batch, root_key, upd, micro_i,
                        grad_acc, ss_acc):
        rng_key = jax.random.fold_in(
            jax.random.fold_in(root_key, upd + 1), micro_i
        )
        grads, loss, sample_size, logging_output, new_model_state = (
            self._compute_grads(train_state, batch, rng_key)
        )
        grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
        return grad_acc, ss_acc + sample_size, logging_output, new_model_state

    def _apply_step_impl(self, train_state, grads, sample_size, lr, new_model_state):
        return self._apply_grads(train_state, grads, sample_size, lr, new_model_state)

    def _multi_step_impl(self, train_state, batches, lrs, root_key, upds):
        """K fused optimizer updates in one executable: scan over the K
        stacked batches, each iteration = the full _fused_step math (same
        grads/clip/update pipeline, per-update lr and in-graph seed-per-
        update rng). One host dispatch instead of K (Keras
        steps_per_execution, redesigned as a lax.scan so XLA pipelines the
        updates back-to-back on device)."""
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

        def body(state, xs):
            batch, lr, upd = xs
            key = jax.random.fold_in(root_key, upd)
            grads, _loss, sample_size, logging_output, new_ms = (
                self._compute_grads(state, batch, key)
            )
            new_state, gnorm = self._apply_grads(
                state, grads, sample_size, lr, new_ms
            )
            return new_state, (gnorm, logging_output)

        new_state, (gnorms, logs) = jax.lax.scan(
            body, train_state, (stacked, lrs, upds)
        )
        return new_state, gnorms, logs

    def _valid_impl(self, train_state, batch, rng_key):
        from ..ops.ring_attention import set_ring_attention
        from ..parallel.mesh import batch_axes, set_sequence_parallel

        rng = RngStream(rng_key)
        batch = self._cast_batch(batch)
        variables = {
            "params": train_state["params"],
            "state": train_state["model_state"],
        }
        set_sequence_parallel(self.mesh if self._seq_parallel else None)
        set_ring_attention(
            self.mesh if self._ring_attention else None,
            batch_axis=batch_axes(self.mesh) if self._ring_attention
            else None,
        )
        try:
            loss, sample_size, logging_output, _ = self.criterion(
                self.model, variables, batch, rng=rng, training=False
            )
        finally:
            set_sequence_parallel(None)
            set_ring_attention(None)
        return loss, sample_size, logging_output

    # ------------------------------------------------------------------
    # host-side API (reference Trainer surface)
    # ------------------------------------------------------------------

    @staticmethod
    def _device_batch(sample) -> Optional[Dict[str, Any]]:
        """Collated host batch -> flat device batch dict (net_input fields
        plus every array-valued auxiliary target: target, target_lengths,
        transcript_*, teacher_output, ...)."""
        if not sample:
            return None
        if "net_input" not in sample:
            # multilingual: dict of per-pair sub-batches
            if all(isinstance(v, dict) for v in sample.values()):
                nested = {}
                for k, v in sample.items():
                    if k == "__lambdas__":
                        # per-update traced loss weights (task.prepare_sample)
                        nested[k] = v
                        continue
                    dev = Trainer._device_batch(v)
                    if dev is not None:
                        nested[k] = dev
                return nested if any(
                    k != "__lambdas__" for k in nested
                ) else None
            return None
        # keep only array-valued fields (drops e.g. the langtok string tag)
        b = {
            k: v
            for k, v in sample["net_input"].items()
            if v is not None and hasattr(v, "ndim")
        }
        for k, v in sample.items():
            if k in ("net_input", "id", "ntokens", "nsentences"):
                continue
            if v is not None and hasattr(v, "ndim"):
                b[k] = v
            elif isinstance(v, dict):
                # auxiliary per-option inputs (sentence_ranking net_input{N})
                sub = {
                    kk: vv for kk, vv in v.items()
                    if vv is not None and hasattr(vv, "ndim")
                }
                if sub:
                    b[k] = sub
        return b

    def stage_sample(self, sample):
        """Device-put a collated host batch ahead of its step (used by the
        DevicePrefetchIterator so the DMA overlaps compute). Metadata
        (ntokens/nsentences/langtok strings) stays host-side; train_step's
        shard_batch recognizes the staged arrays and passes them through."""
        if not sample:
            return sample
        if "net_input" not in sample:
            if all(isinstance(v, dict) for v in sample.values()):
                return {k: self.stage_sample(v) for k, v in sample.items()}
            return sample
        sharding = batch_sharding(self.mesh)
        # under bf16 compute, cast float FEATURES host-side before the
        # transfer: the traced step casts exactly these keys to bf16 anyway
        # (_cast_batch: src_tokens/source), so rounding earlier is
        # numerically identical while halving the host->device bytes (the
        # dominant cost on a tunneled/PCIe link). Other float payloads
        # (e.g. KD teacher probabilities) keep their dtype.
        cast_feature = (
            self.compute_dtype if self.compute_dtype == jnp.bfloat16 else None
        )

        def put(x, is_feature=False):
            if (
                x is not None
                and hasattr(x, "ndim")
                and x.ndim >= 1
                and not isinstance(x, jax.Array)
            ):
                if (
                    is_feature
                    and cast_feature is not None
                    and np.issubdtype(np.asarray(x).dtype, np.floating)
                ):
                    x = np.asarray(x).astype(cast_feature)
                return place_global_array(self.mesh, x, sharding)
            return x

        staged = dict(sample)
        staged["net_input"] = {
            k: put(v, is_feature=k in ("src_tokens", "source"))
            for k, v in sample["net_input"].items()
        }
        for k, v in sample.items():
            if k in ("net_input", "id", "ntokens", "nsentences"):
                continue
            if isinstance(v, dict):
                staged[k] = {kk: put(vv) for kk, vv in v.items()}
            else:
                staged[k] = put(v)
        return staged

    def _step_rng(self):
        # seed-per-update (reference trainer.py:655-661)
        return jax.random.fold_in(self._root_key, self._num_updates + 1)

    def train_step(self, samples: List[dict]) -> Optional[Dict[str, float]]:
        """One optimizer update over update_freq microbatches."""
        metrics.log_start_time("train_wall", priority=800, round=0)
        # host numpy scalars: they ship WITH the dispatch; a jnp.float32 /
        # eager fold_in here would each be an extra device round-trip
        lr = np.float32(self.lr_scheduler.step_update(self._num_updates))

        batches = []
        logging_meta = {"ntokens": 0, "nsentences": 0}
        prepare = getattr(self.task, "prepare_sample", None)
        crit_prepare = getattr(self.criterion, "prepare_sample", None)
        for sample in samples:
            if prepare is not None:
                sample = prepare(sample, self._num_updates)
            if crit_prepare is not None:
                # criterion-specific host-side batch prep (e.g. ASG
                # replabel packing) before the traced step
                sample = crit_prepare(sample, self._num_updates)
            b = self._device_batch(sample)
            if b is None:
                continue
            if "net_input" not in sample:  # nested multilingual sample
                for sub in sample.values():
                    logging_meta["ntokens"] += sub.get("ntokens", 0)
                    logging_meta["nsentences"] += sub.get("nsentences", 0)
            else:
                logging_meta["ntokens"] += sample.get("ntokens", 0)
                logging_meta["nsentences"] += sample.get("nsentences", 0)
            batches.append(shard_batch(self.mesh, b))
        if not batches:
            return None

        if len(batches) == 1:
            self.train_state, gnorm, logging_output = self._fused_step(
                self.train_state, batches[0], lr, self._root_key,
                np.int32(self._num_updates),
            )
        else:
            grad_acc = jax.tree_util.tree_map(
                jnp.zeros_like, self.train_state["params"]
            )
            ss_acc = np.float32(0.0)
            logging_output = None
            new_model_state = self.train_state["model_state"]
            agg_logging: Dict[str, Any] = {}
            for i, b in enumerate(batches):
                grad_acc, ss_acc, logging_output, new_model_state = self._grad_step(
                    self.train_state, b, self._root_key,
                    np.int32(self._num_updates), np.int32(i), grad_acc, ss_acc
                )
                for k, v in logging_output.items():
                    agg_logging[k] = agg_logging.get(k, 0) + v
            logging_output = agg_logging
            self.train_state, gnorm = self._apply_step(
                self.train_state, grad_acc, ss_acc, lr, new_model_state
            )

        self.set_num_updates(self._num_updates + 1)
        if self.bmuf is not None:
            self.train_state["params"] = self.bmuf.step(
                self.train_state["params"], self._num_updates
            )

        self._pending_logs.append((logging_output, gnorm, logging_meta, batches[-1]))
        if self._num_updates % self.log_sync_interval != 0:
            metrics.log_stop_time("train_wall")
            # {} = an update WAS applied, logs deferred to the next sync
            # boundary; None remains "no update" (empty/invalid sample) —
            # the train loop must still run validate/save/max-update checks
            return {}
        out = self.flush_logs()
        metrics.log_stop_time("train_wall")
        return out

    @staticmethod
    def _sample_meta(sample) -> Dict[str, int]:
        meta = {"ntokens": 0, "nsentences": 0}
        if "net_input" not in sample:
            for sub in sample.values():
                if isinstance(sub, dict):
                    meta["ntokens"] += sub.get("ntokens", 0)
                    meta["nsentences"] += sub.get("nsentences", 0)
        else:
            meta["ntokens"] += sample.get("ntokens", 0)
            meta["nsentences"] += sample.get("nsentences", 0)
        return meta

    @staticmethod
    def _batch_signature(batch):
        leaves, treedef = jax.tree_util.tree_flatten(batch)
        return treedef, [
            (leaf.shape, str(leaf.dtype)) if hasattr(leaf, "shape") else leaf
            for leaf in leaves
        ]

    def _train_steps_sequential(self, samples) -> Optional[Dict[str, float]]:
        out = None
        for sample in samples:
            r = self.train_step([sample])
            if r is not None:
                out = r
        return out

    def train_step_multi(self, samples: List[dict]) -> Optional[Dict[str, float]]:
        """K = steps_per_execution optimizer updates in ONE device dispatch
        (each sample is one update's full batch; update_freq must be 1).
        Falls back to per-step dispatch when the group is ragged: shorter
        than K (epoch tail), batches whose shapes differ (bucketed audio
        lengths), or an empty/invalid sample — identical math either way."""
        K = self.steps_per_execution
        if len(samples) != K or self.bmuf is not None:
            return self._train_steps_sequential(samples)
        metrics.log_start_time("train_wall", priority=800, round=0)
        base = self._num_updates
        prepare = getattr(self.task, "prepare_sample", None)
        crit_prepare = getattr(self.criterion, "prepare_sample", None)
        batches, metas = [], []
        for i, sample in enumerate(samples):
            if prepare is not None:
                sample = prepare(sample, base + i)
            if crit_prepare is not None:
                sample = crit_prepare(sample, base + i)
            b = self._device_batch(sample)
            if b is None:
                metrics.log_stop_time("train_wall")
                return self._train_steps_sequential(samples)
            metas.append(self._sample_meta(sample))
            batches.append(shard_batch(self.mesh, b))
        sig0 = self._batch_signature(batches[0])
        if any(self._batch_signature(b) != sig0 for b in batches[1:]):
            metrics.log_stop_time("train_wall")
            return self._train_steps_sequential(samples)

        lrs = np.asarray(
            [self.lr_scheduler.step_update(base + i) for i in range(K)],
            dtype=np.float32,
        )
        upds = np.arange(base + 1, base + 1 + K, dtype=np.int32)
        new_state, gnorms, logs = self._multi_step(
            self.train_state, tuple(batches), lrs, self._root_key, upds
        )
        self.train_state = new_state
        self.set_num_updates(base + K)

        # one pending entry for the whole block; flush expands it host-side
        self._pending_logs.append((logs, gnorms, metas, batches))
        sync = self.log_sync_interval
        if (base + K) // sync == base // sync:
            metrics.log_stop_time("train_wall")
            return {}
        out = self.flush_logs()
        metrics.log_stop_time("train_wall")
        return out

    def flush_logs(self):
        """Sync any deferred logging outputs to the host (no-op when
        log_sync_interval == 1 and nothing is pending)."""
        out = None
        if not self._pending_logs:
            return out
        # ONE device->host transfer for every pending scalar: fetching them
        # leaf-by-leaf costs a round-trip each (ruinous on a tunneled TPU)
        fetched = jax.device_get(
            [(lo, gn) for lo, gn, _, _ in self._pending_logs]
        )
        pending = []
        for (flo, fgn), (_, _, meta, last_batch) in zip(
            fetched, self._pending_logs
        ):
            if isinstance(meta, list):
                # steps_per_execution block: logging values and gnorm carry
                # a leading per-update axis — expand host-side
                for i, m in enumerate(meta):
                    pending.append((
                        {k: v[i] for k, v in flo.items()},
                        fgn[i], m, last_batch[i],
                    ))
            else:
                pending.append((flo, fgn, meta, last_batch))
        for logging_output, gnorm, meta, last_batch in pending:
            logging_output = {
                k: float(np.asarray(v)) for k, v in logging_output.items()
            }
            gnorm = float(np.asarray(gnorm))
            if not np.isfinite(gnorm):
                # localize the blow-up by re-running the batch (reference
                # NanDetector re-run contract, trainer.py:444-451)
                from .nan_detector import analyze_failing_step

                findings = analyze_failing_step(self, last_batch)
                raise FloatingPointError(
                    "gradient norm is {}; NaN/Inf detected in gradients. "
                    "First findings: {}".format(gnorm, findings[:3])
                )
            self._log_training(logging_output, gnorm, meta)
            out = logging_output
        self._pending_logs = []
        return out

    def _log_training(self, logging_output, gnorm, meta):
        sample_size = logging_output.get("sample_size", 1)
        ntokens = meta.get("ntokens", logging_output.get("ntokens", 0))
        metrics.log_speed("ups", 1.0, priority=100, round=2)
        metrics.log_scalar("gnorm", gnorm, priority=400, round=3)
        metrics.log_scalar(
            "lr", self.lr_scheduler.step_update(self._num_updates),
            weight=0, priority=300,
        )
        if ntokens:
            metrics.log_speed("wps", ntokens, priority=90, round=1)
        metrics.log_scalar("bsz", meta.get("nsentences", 0), priority=190, round=1)
        self.task.reduce_metrics([logging_output], self.criterion, metrics)

    def valid_step(self, sample) -> Optional[Dict[str, float]]:
        crit_prepare = getattr(self.criterion, "prepare_sample", None)
        if crit_prepare is not None:
            sample = crit_prepare(sample, self._num_updates, training=False)
        b = self._device_batch(sample)
        if b is None:
            return None
        b = shard_batch(self.mesh, b)
        loss, sample_size, logging_output = self._jit_valid(
            self.train_state, b, self._valid_key
        )
        # one transfer for all scalars (leaf-by-leaf float() costs a device
        # round-trip each — ruinous on a tunneled host)
        logging_output = jax.device_get(logging_output)
        logging_output = {k: float(np.asarray(v)) for k, v in logging_output.items()}
        # host-side task extras (e.g. --eval-bleu decoding) run on the raw
        # collated sample, not the device batch
        logging_output.update(self.task.valid_step_extra(sample, self))
        self.task.reduce_metrics([logging_output], self.criterion, metrics)
        return logging_output

    # -- bookkeeping -----------------------------------------------------

    def get_num_updates(self) -> int:
        return self._num_updates

    def set_num_updates(self, num_updates: int) -> None:
        self._num_updates = num_updates
        self.lr_scheduler.step_update(num_updates)
        if self.quantizer is not None:
            # update-scheduled iPQ stage boundaries (reference
            # trainer.py:624-625)
            self.quantizer.step_update(num_updates)
        metrics.log_scalar("num_updates", num_updates, weight=0, priority=200)

    def get_lr(self) -> float:
        return self.lr_scheduler.step_update(self._num_updates)

    def lr_step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        return self.lr_scheduler.step(epoch, val_loss)

    @property
    def params(self):
        return self.train_state["params"]

    @property
    def model_state(self):
        return self.train_state["model_state"]

    def variables(self):
        return {
            "params": self.train_state["params"],
            "state": self.train_state["model_state"],
        }

    def state_for_checkpoint(self) -> Dict[str, Any]:
        def host(tree):
            # multi-host + FSDP/TP: leaves sharded across PROCESSES are not
            # device_get-able (non-addressable shards); all-gather those
            # through the mesh first. Called by save_checkpoint on EVERY
            # process in lockstep, so the collective is safe.
            leaves = jax.tree_util.tree_leaves(tree)
            if any(
                isinstance(x, jax.Array) and not x.is_fully_addressable
                for x in leaves
            ):
                from jax.experimental import multihost_utils

                return multihost_utils.process_allgather(tree, tiled=True)
            return jax.device_get(tree)

        return {
            "params": host(self.train_state["params"]),
            "model_state": host(self.train_state["model_state"]),
            "opt_state": host(self.train_state["opt_state"]),
            "lr_scheduler": self.lr_scheduler.state_dict(),
            "num_updates": self._num_updates,
        }

    def load_trainer_state(
        self,
        state: Dict[str, Any],
        reset_optimizer: bool = False,
        reset_lr_scheduler: bool = False,
    ) -> None:
        if jax.tree_util.tree_structure(
            state["params"]
        ) != jax.tree_util.tree_structure(self.train_state["params"]):
            # structurally different checkpoint (e.g. PQ-quantized layers
            # carrying w_codes/w_centroids): rebuild shardings + optimizer
            # over the checkpoint's tree before restoring into it
            self.reinitialize(state["params"])
        new_state = dict(self.train_state)
        # restore with the SAME placements as at init: params keep their TP
        # sharding and the optimizer moments theirs — re-placing everything
        # replicated would silently drop TP sharding on resume
        new_state["params"] = jax.device_put(state["params"], self._param_shard)
        new_state["model_state"] = jax.device_put(
            state["model_state"], replicated(self.mesh)
        )
        if not reset_optimizer and state.get("opt_state") is not None:
            restored = jax.tree_util.tree_map(
                lambda ref, v: jnp.asarray(v), self.train_state["opt_state"],
                state["opt_state"],
            )
            new_state["opt_state"] = jax.device_put(restored, self._opt_shard)
        self.train_state = new_state
        if not reset_lr_scheduler and state.get("lr_scheduler") is not None:
            self.lr_scheduler.load_state_dict(state["lr_scheduler"])
        self.set_num_updates(state.get("num_updates", 0))
