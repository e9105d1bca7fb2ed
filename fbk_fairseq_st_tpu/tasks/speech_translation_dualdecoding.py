"""speech_translation_dualdecoding task (reference tasks/
speech_translation_dualdecoding.py): same data as
speech_translation_with_transcription; the generator is the two-phase
hierarchical beam search producing joint transcript+translation."""

from __future__ import annotations

from ..registry import register_task
from .speech_translation_ctc import SpeechTranslationCTCTask

# generator kwarg <- (args attribute, default): the CLI generation-args
# contract shared with the base SequenceGenerator dispatch
_GEN_ARG_MAP = {
    "beam_size": ("beam", 5),
    "max_len_a": ("max_len_a", 0),
    "max_len_b": ("max_len_b", 200),
    "min_len": ("min_len", 1),
    "len_penalty": ("lenpen", 1),
    "unk_penalty": ("unkpen", 0),
    "temperature": ("temperature", 1.0),
    "match_source_len": ("match_source_len", False),
    "no_repeat_ngram_size": ("no_repeat_ngram_size", 0),
}


@register_task("speech_translation_dualdecoding")
class SpeechTranslationDualDecodingTask(SpeechTranslationCTCTask):
    def build_generator(self, models, args):
        from ..generation.twophase_sequence_generator import (
            TwoPhaseSequenceGenerator,
        )

        kwargs = {
            name: getattr(args, attr, default)
            for name, (attr, default) in _GEN_ARG_MAP.items()
        }
        kwargs["normalize_scores"] = not getattr(args, "unnormalized", False)
        return TwoPhaseSequenceGenerator(
            self.source_dictionary, self.target_dictionary, **kwargs
        )
