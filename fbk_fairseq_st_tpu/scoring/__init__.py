from .bleu import Scorer, SacrebleuScorer  # noqa: F401
