"""speech_recognition task: fbank -> text (ASR or direct ST).

Counterpart of examples/speech_recognition/tasks/speech_recognition.py:86-263:
loads ``dict.<tgt>.txt`` (or dict.txt), reads the indexed precomputed-fbank
route (``<split>.npz.{bin,idx}`` + ``<split>.<lang>`` indexed text,
get_datasets_from_indexed_filterbanks :73-84), supports multiple data dirs
concatenated with os.pathsep, per-utterance CMVN unless --skip-normalization,
and applies SpecAugment/TimeStretch on the collated batch during training
(here: as jit-traced device ops via ``augment_batch``).
"""

from __future__ import annotations

import logging
import os

from ..data.datasets import ConcatDataset, FilterBankToTextDataset
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import FilterBanksDataset, load_indexed_dataset
from ..ops.specaugment import (
    SpecAugmentConfig,
    TimeStretchConfig,
    specaugment,
    time_stretch,
)
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)


def get_datasets_from_indexed_filterbanks(
    data_path,
    tgt_lang,
    tgt_dict,
    split,
    dataset_impl,
    skip_norm,
    legacy_audio_fix_lua_indexing,
):
    """Reference tasks/speech_recognition.py:73-84."""
    prefix = os.path.join(data_path, split)
    src_dataset = FilterBanksDataset(
        prefix + ".npz", legacy_audio_fix_lua_indexing=legacy_audio_fix_lua_indexing
    )
    tgt_dataset = None
    if tgt_lang is not None:
        tgt_dataset = load_indexed_dataset(
            prefix + "." + tgt_lang, tgt_dict, dataset_impl
        )
    return FilterBankToTextDataset(src_dataset, tgt_dataset, tgt_dict, skip_norm)


@register_task("speech_recognition")
class SpeechRecognitionTask(Task):
    @staticmethod
    def add_args(parser):
        parser.add_argument("data", help="path to data directory. For multiple "
                            "directories, use column to concatenate them.")
        parser.add_argument("--silence-token", default="▁",
                            help="token for silence (used by w2l)")
        parser.add_argument("--max-source-positions", default=1024, type=int, metavar="N",
                            help="max number of tokens in the source sequence")
        parser.add_argument("--max-target-positions", default=1024, type=int, metavar="N",
                            help="max number of tokens in the target sequence")
        parser.add_argument("--dataset-from-json", action="store_true", default=False,
                            help="whether to read the data from a JSON file or from "
                            "indexed data containing the precomputed filterbanks")
        parser.add_argument("-t", "--target-lang", default=None, metavar="TARGET",
                            help="target language")
        parser.add_argument("--skip-normalization", action="store_true", default=False,
                            help="if set, the input filterbanks are not normalized")
        parser.add_argument("--legacy-audio-fix-lua-indexing", action="store_true",
                            default=False, help="if set, the input filterbanks are "
                            "subtracted 1 to remove +1 for lua indexing")
        parser.add_argument("--specaugment", action="store_true", default=False)
        parser.add_argument("--frequency-masking-pars", type=int, default=13,
                            help="Maximum number of frequencies that can be masked")
        parser.add_argument("--time-masking-pars", type=int, default=13,
                            help="Maximum number of time steps that can be masked")
        parser.add_argument("--frequency-masking-num", type=int, default=2,
                            help="Number of masks to apply along the frequency dimension")
        parser.add_argument("--time-masking-num", type=int, default=2,
                            help="Number of masks to apply along the time dimension")
        parser.add_argument("--specaugment-rate", type=float, default=1.0,
                            help="Probability to apply specaugment to a spectrogram")
        parser.add_argument("--time-stretch", action="store_true",
                            help="If set, activates time stretch on spectrograms")
        parser.add_argument("--time-stretch-rate", type=float, default=1.0,
                            help="Probability to apply time stretch to a spectrogram")
        parser.add_argument("--time-stretch-w", type=int, default=1,
                            help="Window size for time stretch")
        parser.add_argument("--time-stretch-low", type=float, default=0.8,
                            help="Low side of the stretch range")
        parser.add_argument("--time-stretch-high", type=float, default=1.25,
                            help="High side of the stretch range")

    def __init__(self, args, tgt_dict):
        super().__init__(args)
        self.tgt_dict = tgt_dict
        self.paths = args.data.split(os.pathsep)
        self.specaugment_cfg = (
            SpecAugmentConfig(
                frequency_masking_pars=args.frequency_masking_pars,
                time_masking_pars=args.time_masking_pars,
                frequency_masking_num=args.frequency_masking_num,
                time_masking_num=args.time_masking_num,
                rate=args.specaugment_rate,
            )
            if getattr(args, "specaugment", False)
            else None
        )
        self.time_stretch_cfg = (
            TimeStretchConfig(
                rate=args.time_stretch_rate,
                w=args.time_stretch_w,
                low=args.time_stretch_low,
                high=args.time_stretch_high,
            )
            if getattr(args, "time_stretch", False)
            else None
        )

    @classmethod
    def setup_task(cls, args, **kwargs):
        if args.target_lang is None:
            dict_basename = "dict.txt"
        else:
            dict_basename = "dict.{}.txt".format(args.target_lang)
        dict_path = os.path.join(args.data.split(os.pathsep)[0], dict_basename)
        if not os.path.isfile(dict_path):
            raise FileNotFoundError("Dict not found: {}".format(dict_path))
        tgt_dict = Dictionary.load(dict_path)
        if getattr(args, "criterion", None) == "ctc_loss":
            tgt_dict.add_symbol("<ctc_blank>")
        elif getattr(args, "criterion", None) == "asg_loss":
            # replabel symbols must be dictionary entries, or packing would
            # silently map them to <unk> (reference
            # tasks/speech_recognition.py:168-170)
            from ..data.replabels import replabel_symbol

            for i in range(1, getattr(args, "max_replabel", 2) + 1):
                tgt_dict.add_symbol(replabel_symbol(i))
        logger.info("dictionary: {} types".format(len(tgt_dict)))
        return cls(args, tgt_dict)

    def load_dataset(self, split, combine=False, **kwargs):
        datasets = []
        for path in self.paths:
            try:
                if getattr(self.args, "dataset_from_json", False):
                    # JSON route (reference :184-186): asr_prep_json output,
                    # features extracted on the fly
                    from ..data.asr_json import get_asr_dataset_from_json

                    ds = get_asr_dataset_from_json(
                        os.path.join(path, "{}.json".format(split)),
                        self.tgt_dict,
                        self.args.skip_normalization,
                        num_mel_bins=getattr(
                            self.args, "input_feat_per_channel", 80
                        ),
                    )
                else:
                    ds = get_datasets_from_indexed_filterbanks(
                        path,
                        self.args.target_lang,
                        self.tgt_dict,
                        split,
                        getattr(self.args, "dataset_impl", None),
                        self.args.skip_normalization,
                        self.args.legacy_audio_fix_lua_indexing,
                    )
                datasets.append(ds)
            except (FileNotFoundError, AssertionError):
                logger.warning(
                    "Split {} not found in {}. Skipping...".format(split, path)
                )
        assert len(datasets) > 0, f"no data found for split {split}"
        if len(datasets) > 1:
            self.datasets[split] = ConcatDataset(datasets)
        else:
            self.datasets[split] = datasets[0]

    def augment_batch(self, batch, rng):
        """TimeStretch then SpecAugment on the device batch (order per
        reference train_step :255-258)."""
        if self.time_stretch_cfg is None and self.specaugment_cfg is None:
            return batch
        batch = dict(batch)
        x = batch["src_tokens"]
        lengths = batch["src_lengths"]
        if self.time_stretch_cfg is not None:
            x, lengths = time_stretch(rng.next(), x, lengths, self.time_stretch_cfg)
        if self.specaugment_cfg is not None:
            x = specaugment(rng.next(), x, self.specaugment_cfg)
        batch["src_tokens"] = x
        batch["src_lengths"] = lengths
        return batch

    @property
    def target_dictionary(self):
        return self.tgt_dict

    @property
    def source_dictionary(self):
        return None

    def max_positions(self):
        return (self.args.max_source_positions, self.args.max_target_positions)
