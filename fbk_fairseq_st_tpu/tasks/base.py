"""Task ABC — component factory + data/iterator policy.

Counterpart of the reference FairseqTask (fairseq/tasks/fairseq_task.py:
14-421): owns dictionaries, loads datasets, builds batch iterators
(size-ordered indices -> filter by max_positions -> batch_by_size ->
EpochBatchIterator), and builds models/criterions/generators via the
registries.

The reference's ``train_step`` (fwd+bwd+optimizer plumbing) moves into the
jitted Trainer step; tasks instead expose ``augment_batch`` — a pure,
jit-traceable hook where SpecAugment/TimeStretch run on device (the
reference applies them host-side inside task.train_step,
tasks/speech_recognition.py:234-263).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..data.batching import ShapeBucketer, batch_by_size, filter_by_size
from ..data.iterators import EpochBatchIterator
from ..registry import CRITERIONS, build_model


class Task:
    def __init__(self, args):
        self.args = args
        self.datasets: Dict[str, object] = {}

    @classmethod
    def add_args(cls, parser) -> None:
        pass

    @classmethod
    def setup_task(cls, args, **kwargs) -> "Task":
        return cls(args)

    def load_dataset(self, split: str, combine: bool = False, **kwargs) -> None:
        raise NotImplementedError

    def dataset(self, split: str):
        if split not in self.datasets:
            raise KeyError(f"Dataset not loaded: {split}")
        return self.datasets[split]

    # -- batching -------------------------------------------------------------

    def get_batch_iterator(
        self,
        dataset,
        max_tokens: Optional[int] = None,
        max_sentences: Optional[int] = None,
        max_positions=None,
        ignore_invalid_inputs: bool = False,
        required_batch_size_multiple: int = 1,
        seed: int = 1,
        num_shards: int = 1,
        shard_id: int = 0,
        num_workers: int = 0,
        epoch: int = 0,
        bucket_shapes: bool = True,
    ) -> EpochBatchIterator:
        """Reference fairseq_task.py:107-167 plus the TPU shape bucketizer."""
        with _numpy_seed(seed):
            indices = dataset.ordered_indices()

        # RoundRobinZip datasets report dict sizes; filter on the
        # component-wise max instead
        size_fn = getattr(dataset, "max_component_size", dataset.size)
        if max_positions is not None:
            vec_filter = getattr(dataset, "filter_indices_by_size", None)
            if vec_filter is not None:  # sizes-array datasets: no per-index calls
                indices, _ = vec_filter(
                    indices, max_positions,
                    raise_exception=not ignore_invalid_inputs,
                )
            else:
                indices, _ = filter_by_size(
                    indices,
                    size_fn,
                    max_positions,
                    raise_exception=not ignore_invalid_inputs,
                )

        # vectorized sizes feed the native (C++) packer; datasets without
        # num_tokens_vec fall back to the per-index Python loop
        num_tokens = getattr(dataset, "num_tokens_vec", None)
        batch_sampler = batch_by_size(
            indices,
            num_tokens(indices) if num_tokens is not None
            else dataset.num_tokens,
            max_tokens=max_tokens,
            max_sentences=max_sentences,
            required_batch_size_multiple=required_batch_size_multiple,
        )

        collate_pad_fn = None
        if bucket_shapes:
            src_bucketer = ShapeBucketer(min_size=8, max_size=self.max_positions()[0])
            tgt_bucketer = ShapeBucketer(min_size=8, max_size=self.max_positions()[1])
            bsz_bucketer = ShapeBucketer(min_size=8, max_size=4096, growth=2.0)

            def collate_pad_fn(batch_indices: List[int]) -> dict:
                sizes = [size_fn(i) for i in batch_indices]
                if isinstance(sizes[0], tuple):
                    src_max = max(s[0] for s in sizes)
                    tgt_max = max(s[1] for s in sizes)
                else:
                    src_max, tgt_max = max(sizes), 0
                return {
                    "pad_to_src_len": src_bucketer.bucket(int(src_max)),
                    # +1 for the appended eos in encoded target lines
                    "pad_to_tgt_len": tgt_bucketer.bucket(int(tgt_max) + 1),
                    "pad_to_bsz": bsz_bucketer.bucket(len(batch_indices)),
                }

        return EpochBatchIterator(
            dataset=dataset,
            batch_sampler=batch_sampler,
            seed=seed,
            num_shards=num_shards,
            shard_id=shard_id,
            buffer_size=getattr(self.args, "data_buffer_size", 2),
            epoch=epoch,
            collate_pad_fn=collate_pad_fn,
        )

    # -- component factories ---------------------------------------------------

    def build_model(self, args):
        return build_model(args, self)

    def build_criterion(self, args):
        return CRITERIONS[args.criterion].build_criterion(args, self)

    def build_generator(self, models, args):
        from ..generation import build_generator

        return build_generator(self, models, args)

    # -- jit-traceable hooks ----------------------------------------------------

    def augment_batch(self, batch, rng):
        """Device-side training-time augmentation (identity by default)."""
        return batch

    def prepare_sample(self, sample, num_updates: int, training: bool = True):
        """Host-side per-update hook run before the sample enters the jitted
        step; inject traced scalar inputs here (e.g. scheduled loss weights)
        so per-update values never retrace the step. ``training`` is False
        when called from the validation path — schedule-dependent target
        rewrites (e.g. ASG LinSeg) must not apply there."""
        return sample

    def inference_step(self, generator, models, sample, prefix_tokens=None):
        return generator.generate(models, sample, prefix_tokens=prefix_tokens)

    # -- metrics ----------------------------------------------------------------

    def valid_step_extra(self, sample, trainer) -> dict:
        """Host-side per-batch validation hook: extra logging-output entries
        computed from the raw collated sample + live trainer params (the
        reference computes these inside task.valid_step, e.g. validation
        BLEU in translation.py:299-311). Identity by default."""
        return {}

    def reduce_metrics(self, logging_outputs, criterion, metrics) -> None:
        """Aggregate logging outputs into the metrics stack (reference
        FairseqTask.reduce_metrics, fairseq_task.py:372-402: delegates to
        the criterion; tasks override to add derived metrics)."""
        if hasattr(criterion, "reduce_metrics"):
            criterion.reduce_metrics(logging_outputs, metrics)

    # -- dictionaries -----------------------------------------------------------

    @property
    def source_dictionary(self):
        return None

    @property
    def target_dictionary(self):
        return None

    def max_positions(self):
        return (
            getattr(self.args, "max_source_positions", 1024),
            getattr(self.args, "max_target_positions", 1024),
        )


class _numpy_seed:
    """Context-managed numpy seed (reference data_utils.numpy_seed)."""

    def __init__(self, seed: Optional[int]):
        self.seed = seed

    def __enter__(self):
        if self.seed is not None:
            self.state = np.random.get_state()
            np.random.seed(self.seed)

    def __exit__(self, *exc):
        if self.seed is not None:
            np.random.set_state(self.state)
