"""Task registry package. Tasks are registered on import."""

from .base import Task  # noqa: F401
from . import (  # noqa: F401
    audio_pretraining,
    denoising,
    language_modeling,
    legacy_masked_lm,
    masked_lm,
    multilingual_denoising,
    multilingual_masked_lm,
    multilingual_speech_translation,
    multilingual_speech_translation_kd,
    multilingual_translation,
    multitask_speech_translation,
    roberta_wsc,
    semisupervised_translation,
    sentence_prediction,
    sentence_ranking,
    speech_recognition,
    speech_recognition_context,
    speech_translation_ctc,
    speech_translation_ctc_kd,
    speech_translation_dualdecoding,
    translation,
    translation_from_pretrained,
    translation_lev,
    translation_moe,
)
