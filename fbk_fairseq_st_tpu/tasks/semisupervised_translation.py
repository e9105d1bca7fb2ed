"""semisupervised_translation task: parallel + online back-translation +
denoising autoencoder multitask training.

Counterpart of fairseq/tasks/semisupervised_translation.py:31-401. Per
language pair the round-robin batch carries up to three sub-batches:
``src-tgt`` (parallel), ``bt:src-tgt`` (monolingual target back-translated
on the fly with the current reverse model) and ``denoising:src-tgt``
(noised target reconstruction); each is weighted by its lambda.

Deviation from the reference mechanics (not the math): back-translation
reads the live parameters from the trainer (functional params instead of a
shared module). Scheduled lambda configs follow the reference's per-update
linear interpolation (:40-59) exactly: the current values enter the jitted
step as traced scalars (``prepare_sample`` injects ``__lambdas__``), so the
schedule never retraces the step."""

from __future__ import annotations

import logging
import os
import weakref

from ..data.datasets import RoundRobinZipDatasets
from ..data.indexed_dataset import dataset_exists, load_indexed_dataset
from ..data.language_pair_dataset import LanguagePairDataset
from ..data.noising import BacktranslationDataset, NoisingDataset
from ..registry import CRITERIONS, register_task
from .multilingual_translation import MultilingualTranslationTask
from .multilingual_speech_translation import _MultilingualCriterion

logger = logging.getLogger(__name__)


def _get_bt_dataset_key(lang_pair):
    return "bt:" + lang_pair


def _get_denoising_dataset_key(lang_pair):
    return "denoising:" + lang_pair


def parse_lambda_config(x):
    """Reference semisupervised_translation.py:40-59."""
    split = x.split(",")
    if len(split) == 1:
        return float(x), None
    split = [s.split(":") for s in split]
    assert all(len(s) == 2 for s in split)
    assert all(k.isdigit() for k, _ in split)
    assert split[0][0] == "0"
    config = [(int(k), float(v)) for k, v in split]
    return config[0][1], config


def lambda_at(config, n_iter: int) -> float:
    if config is None:
        return None
    for (t0, v0), (t1, v1) in zip(config[:-1], config[1:]):
        if t0 <= n_iter < t1:
            return v0 + (n_iter - t0) * (v1 - v0) / (t1 - t0)
    return config[-1][1]


class _SemisupervisedCriterion(_MultilingualCriterion):
    """Weighted sum over parallel / bt / denoising sub-batches.

    Scheduled lambdas arrive as traced scalars in ``batch['__lambdas__']``
    (injected per update by the task's ``prepare_sample``); constant lambdas
    stay Python floats so zero-weighted objectives are skipped at trace
    time."""

    def __call__(self, model, variables, batch, rng=None, training=False):
        task = self.task
        lams = batch.get("__lambdas__")
        total_loss, total_ss = 0.0, 0.0
        logging = {}
        new_state = variables["state"]

        def run(key, pair, weight, scheduled):
            nonlocal total_loss, total_ss, new_state
            if lams is not None and scheduled:
                static_zero = False
                weight = lams[scheduled]
            else:
                static_zero = weight == 0.0
            if static_zero or key not in batch or not batch[key]:
                return
            view = model.pair_view(pair)
            loss, ss, log, new_state2 = self.inner(
                view,
                {"params": variables["params"], "state": new_state},
                batch[key], rng=rng, training=training,
            )
            new_state = new_state2
            total_loss += weight * loss
            total_ss += ss
            for k, v in log.items():
                logging[k] = logging.get(k, 0) + v
                logging[f"{key}:{k}"] = v

        for pair in task.lang_pairs:
            run(pair, pair, task.lambda_parallel,
                "parallel" if task.lambda_parallel_steps else None)
            run(_get_bt_dataset_key(pair), pair, task.lambda_otf_bt,
                "otf_bt" if task.lambda_otf_bt_steps else None)
            run(_get_denoising_dataset_key(pair), pair, task.lambda_denoising,
                "denoising" if task.lambda_denoising_steps else None)
        logging["loss"] = total_loss
        logging["sample_size"] = total_ss
        return total_loss, total_ss, logging, new_state


@register_task("semisupervised_translation")
class SemisupervisedTranslationTask(MultilingualTranslationTask):
    @staticmethod
    def add_args(parser):
        MultilingualTranslationTask.add_args(parser)
        # reference :85-119
        parser.add_argument("--lambda-parallel-config", default="1.0",
                            type=str, metavar="CONFIG")
        parser.add_argument("--lambda-denoising-config", default="0.0",
                            type=str, metavar="CONFIG")
        parser.add_argument("--lambda-otf-bt-config", default="0.0",
                            type=str, metavar="CONFIG")
        parser.add_argument("--bt-max-len-a", default=1.1, type=float)
        parser.add_argument("--bt-max-len-b", default=10.0, type=float)
        parser.add_argument("--bt-beam-size", default=1, type=int)
        parser.add_argument("--max-word-shuffle-distance", default=3.0,
                            type=float)
        parser.add_argument("--word-dropout-prob", default=0.1, type=float)
        parser.add_argument("--word-blanking-prob", default=0.2, type=float)

    def __init__(self, args, dicts, training):
        super().__init__(args, dicts, training)
        self.lambda_parallel, self.lambda_parallel_steps = (
            parse_lambda_config(args.lambda_parallel_config)
        )
        self.lambda_otf_bt, self.lambda_otf_bt_steps = parse_lambda_config(
            args.lambda_otf_bt_config
        )
        self.lambda_denoising, self.lambda_denoising_steps = (
            parse_lambda_config(args.lambda_denoising_config)
        )
        self.backtranslators = {}
        self._trainer = None

    def set_trainer(self, trainer):
        """Registered by the train CLI so online back-translation reads the
        live parameters."""
        self._trainer = weakref.ref(trainer)

    def set_epoch_updates(self, num_updates: int):
        """Re-evaluate scheduled lambdas (kept current for host-side users:
        dataset-loading decisions and the validation path)."""
        if self.lambda_parallel_steps is not None:
            self.lambda_parallel = lambda_at(
                self.lambda_parallel_steps, num_updates
            )
        if self.lambda_otf_bt_steps is not None:
            self.lambda_otf_bt = lambda_at(
                self.lambda_otf_bt_steps, num_updates
            )
        if self.lambda_denoising_steps is not None:
            self.lambda_denoising = lambda_at(
                self.lambda_denoising_steps, num_updates
            )

    def prepare_sample(self, sample, num_updates: int, training: bool = True):
        """Inject the per-update scheduled lambdas as traced scalars
        (reference semisupervised_translation.py:388-397 update_step); the
        schedule changes values, not shapes, so the step never retraces."""
        import numpy as np

        scheduled = {}
        if self.lambda_parallel_steps is not None:
            scheduled["parallel"] = lambda_at(
                self.lambda_parallel_steps, num_updates
            )
        if self.lambda_otf_bt_steps is not None:
            scheduled["otf_bt"] = lambda_at(
                self.lambda_otf_bt_steps, num_updates
            )
        if self.lambda_denoising_steps is not None:
            scheduled["denoising"] = lambda_at(
                self.lambda_denoising_steps, num_updates
            )
        if not scheduled or not sample:
            return sample
        sample = dict(sample)
        sample["__lambdas__"] = {
            k: np.asarray(v, np.float32) for k, v in scheduled.items()
        }
        return sample

    def _mono_path(self, data_path, split, lang):
        for name in (
            f"{split}.{lang}-None.{lang}",
            f"{split}.{lang}",
        ):
            p = os.path.join(data_path, name)
            if dataset_exists(p, impl=getattr(self.args, "dataset_impl", None)):
                return p
        return None

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        paths = self.args.data.split(os.pathsep)
        data_path = paths[(epoch - 1) % len(paths)]
        datasets = {}

        want_parallel = (
            self.lambda_parallel > 0.0
            or self.lambda_parallel_steps is not None
            or not split.startswith("train")
        )
        if want_parallel:
            for pair in self.lang_pairs:
                datasets[pair] = self._pair_dataset(split, pair)

        if (
            self.lambda_otf_bt > 0.0 or self.lambda_otf_bt_steps is not None
        ) and split.startswith("train"):
            for pair in self.lang_pairs:
                src, tgt = pair.split("-")
                path = self._mono_path(data_path, split, tgt)
                if path is None:
                    raise FileNotFoundError(
                        "backtranslation mono data not found for {} in {}"
                        .format(tgt, data_path)
                    )
                mono = load_indexed_dataset(
                    path, self.dicts[tgt],
                    getattr(self.args, "dataset_impl", None),
                )
                # tgt-side-only pairs for the reverse generation
                tgt_only = self.alter_dataset_langtok(
                    LanguagePairDataset(
                        mono, mono.sizes, self.dicts[tgt],
                        left_pad_source=self.args.left_pad_source,
                        left_pad_target=self.args.left_pad_target,
                    ),
                    src_eos=self.dicts[tgt].eos(), src_lang=tgt,
                    tgt_lang=src,
                )
                output_pair = self.alter_dataset_langtok(
                    LanguagePairDataset(
                        mono, mono.sizes, self.dicts[src],
                        mono, mono.sizes, self.dicts[tgt],
                        left_pad_source=self.args.left_pad_source,
                        left_pad_target=self.args.left_pad_target,
                    ),
                    src_eos=self.dicts[src].eos(), src_lang=src,
                    tgt_eos=self.dicts[tgt].eos(), tgt_lang=tgt,
                )
                datasets[_get_bt_dataset_key(pair)] = BacktranslationDataset(
                    tgt_dataset=tgt_only,
                    src_dict=self.dicts[src], tgt_dict=self.dicts[tgt],
                    # resolved lazily: build_model fills backtranslators
                    backtranslation_fn=(
                        lambda b, _p=pair: self.backtranslators[_p](b)
                    ),
                    output_collater=output_pair.collater,
                )

        if (
            self.lambda_denoising > 0.0
            or self.lambda_denoising_steps is not None
        ) and split.startswith("train"):
            for pair in self.lang_pairs:
                src, tgt = pair.split("-")
                path = self._mono_path(data_path, split, tgt)
                if path is None:
                    continue
                mono = load_indexed_dataset(
                    path, self.dicts[tgt],
                    getattr(self.args, "dataset_impl", None),
                )
                noised = NoisingDataset(
                    mono, self.dicts[tgt], seed=1,
                    max_word_shuffle_distance=(
                        self.args.max_word_shuffle_distance
                    ),
                    word_dropout_prob=self.args.word_dropout_prob,
                    word_blanking_prob=self.args.word_blanking_prob,
                )
                datasets[_get_denoising_dataset_key(pair)] = (
                    self.alter_dataset_langtok(
                        LanguagePairDataset(
                            noised, mono.sizes, self.dicts[tgt],
                            mono, mono.sizes, self.dicts[tgt],
                            left_pad_source=self.args.left_pad_source,
                            left_pad_target=self.args.left_pad_target,
                        ),
                        src_eos=self.dicts[tgt].eos(), src_lang=tgt,
                        tgt_eos=self.dicts[tgt].eos(), tgt_lang=tgt,
                    )
                )

        if self.training_mode:
            self.datasets[split] = RoundRobinZipDatasets(datasets)
        else:
            self.datasets[split] = datasets[self.lang_pairs[0]]

    def build_model(self, args):
        from ..registry import build_model

        model = build_model(args, self)
        if (
            self.lambda_otf_bt > 0.0 or self.lambda_otf_bt_steps is not None
        ) and self.training_mode:
            from ..generation import SequenceGenerator

            for pair in self.lang_pairs:
                src, tgt = pair.split("-")
                reverse = "{}-{}".format(tgt, src)
                generator = SequenceGenerator(
                    self.dicts[src],
                    beam_size=self.args.bt_beam_size,
                    max_len_a=self.args.bt_max_len_a,
                    max_len_b=self.args.bt_max_len_b,
                )
                bos_token = (
                    self.get_decoder_langtok(src)
                    if self.args.decoder_langtok else None
                )

                def backtranslate_fn(batch, _reverse=reverse,
                                     _gen=generator, _bos=bos_token):
                    trainer = self._trainer() if self._trainer else None
                    assert trainer is not None, (
                        "online back-translation requires task.set_trainer"
                    )
                    variables = {
                        "params": trainer.train_state["params"],
                        "state": trainer.train_state["model_state"],
                    }
                    view = model.pair_view(_reverse)
                    return _gen.generate(
                        [(view, variables)],
                        {"net_input": batch["net_input"], "id": batch["id"]},
                        bos_token=_bos,
                    )

                self.backtranslators[pair] = backtranslate_fn
        return model

    def build_criterion(self, args):
        inner = CRITERIONS[args.criterion].build_criterion(args, self)
        if self.training_mode:
            return _SemisupervisedCriterion(inner, self)
        return inner
