"""speech_translation_dualdecoding task (reference tasks/
speech_translation_dualdecoding.py): same data as
speech_translation_with_transcription; the generator is the two-phase
hierarchical beam search producing joint transcript+translation."""

from __future__ import annotations

from ..registry import register_task
from .speech_translation_ctc import SpeechTranslationCTCTask


@register_task("speech_translation_dualdecoding")
class SpeechTranslationDualDecodingTask(SpeechTranslationCTCTask):
    def build_generator(self, models, args):
        from ..generation.twophase_sequence_generator import (
            TwoPhaseSequenceGenerator,
        )

        return TwoPhaseSequenceGenerator(
            self.source_dictionary,
            self.target_dictionary,
            beam_size=getattr(args, "beam", 5),
            max_len_a=getattr(args, "max_len_a", 0),
            max_len_b=getattr(args, "max_len_b", 200),
            min_len=getattr(args, "min_len", 1),
            normalize_scores=(not getattr(args, "unnormalized", False)),
            len_penalty=getattr(args, "lenpen", 1),
            unk_penalty=getattr(args, "unkpen", 0),
            temperature=getattr(args, "temperature", 1.0),
            match_source_len=getattr(args, "match_source_len", False),
            no_repeat_ngram_size=getattr(args, "no_repeat_ngram_size", 0),
        )
