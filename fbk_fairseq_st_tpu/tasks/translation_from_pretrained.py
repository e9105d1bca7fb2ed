"""Fine-tuning translation tasks for multilingual pretrained models.

Counterparts of fairseq/tasks/translation_from_pretrained_bart.py:14-114
(mBART: '[lang]' symbols appended to the dictionaries and to every
source/target sentence; generation terminates on the target-language token)
and fairseq/tasks/translation_from_pretrained_xlm.py:12-31 (translation
with the MaskedLMDictionary so XLM-binarized data loads)."""

from __future__ import annotations

from ..data.dictionary import Dictionary
from ..registry import register_task
from .translation import TranslationTask, load_langpair_dataset


class MaskedLMDictionary(Dictionary):
    """Dictionary with a <mask> symbol (reference
    fairseq/data/legacy/masked_lm_dictionary.py)."""

    def __init__(self, pad="<pad>", eos="</s>", unk="<unk>", mask="<mask>"):
        super().__init__(pad=pad, eos=eos, unk=unk)
        self.mask_word = mask
        self.mask_index = self.add_symbol(mask)
        self.nspecial = len(self.symbols)

    def mask(self):
        return self.mask_index


@register_task("translation_from_pretrained_bart")
class TranslationFromPretrainedBARTTask(TranslationTask):
    @staticmethod
    def add_args(parser):
        TranslationTask.add_args(parser)
        parser.add_argument("--langs", required=True, metavar="LANG",
                            help="comma-separated list of the PRETRAINING "
                                 "languages (same order as pretraining)")
        parser.add_argument("--prepend-bos", action="store_true")

    def __init__(self, args, src_dict, tgt_dict):
        super().__init__(args, src_dict, tgt_dict)
        self.langs = args.langs.split(",")
        for d in [src_dict, tgt_dict]:
            for lang in self.langs:
                d.add_symbol("[{}]".format(lang))
            d.add_symbol("<mask>")

    def load_dataset(self, split, epoch=1, combine=False, **kwargs):
        data_path = self.paths[(epoch - 1) % len(self.paths)]
        src, tgt = self.args.source_lang, self.args.target_lang
        self.datasets[split] = load_langpair_dataset(
            data_path, split, src, self.src_dict, tgt, self.tgt_dict,
            combine=combine,
            dataset_impl=getattr(self.args, "dataset_impl", None),
            upsample_primary=self.args.upsample_primary,
            left_pad_source=self.args.left_pad_source,
            left_pad_target=self.args.left_pad_target,
            max_source_positions=getattr(
                self.args, "max_source_positions", 1024
            ),
            max_target_positions=getattr(
                self.args, "max_target_positions", 1024
            ),
            load_alignments=getattr(self.args, "load_alignments", False),
            prepend_bos=getattr(self.args, "prepend_bos", False),
            append_source_id=True,
        )

    def build_generator(self, models, args):
        from ..generation import SequenceGenerator
        from ..generation.sequence_scorer import SequenceScorer

        eos = self.tgt_dict.index("[{}]".format(self.args.target_lang))
        if getattr(args, "score_reference", False):
            return SequenceScorer(self.target_dictionary, eos=eos)
        return SequenceGenerator(
            self.target_dictionary,
            beam_size=getattr(args, "beam", 5),
            max_len_a=getattr(args, "max_len_a", 0),
            max_len_b=getattr(args, "max_len_b", 200),
            min_len=getattr(args, "min_len", 1),
            normalize_scores=(not getattr(args, "unnormalized", False)),
            len_penalty=getattr(args, "lenpen", 1),
            unk_penalty=getattr(args, "unkpen", 0),
            temperature=getattr(args, "temperature", 1.0),
            no_repeat_ngram_size=getattr(args, "no_repeat_ngram_size", 0),
            seed=getattr(args, "seed", 1),
            eos=eos,
        )


@register_task("translation_from_pretrained_xlm")
class TranslationFromPretrainedXLMTask(TranslationTask):
    """Translation with the MaskedLMDictionary (XLM-binarized data)."""

    @classmethod
    def load_dictionary(cls, filename):
        return MaskedLMDictionary.load(filename)

    @classmethod
    def setup_task(cls, args, **kwargs):
        import os

        args.left_pad_source = str(args.left_pad_source).lower() == "true"
        args.left_pad_target = str(args.left_pad_target).lower() == "true"
        paths = args.data.split(os.pathsep)
        src_dict = cls.load_dictionary(
            os.path.join(paths[0], f"dict.{args.source_lang}.txt")
        )
        tgt_dict = cls.load_dictionary(
            os.path.join(paths[0], f"dict.{args.target_lang}.txt")
        )
        return cls(args, src_dict, tgt_dict)
