"""Noisy-channel reranking CLI (reference examples/noisychannel/rerank.py
cli_main + rerank_options.py): forward n-best + channel-model and LM
rescoring, weight combination / random-search tuning, corpus BLEU."""

from __future__ import annotations

import logging
import sys

from .. import options
from ..noisychannel import rerank_main

logger = logging.getLogger(__name__)


def _float_pair(s):
    lo, hi = (float(x) for x in s.split(","))
    return (lo, hi)


def add_rerank_args(parser):
    group = parser.add_argument_group("rerank")
    group.add_argument("--score-model", type=str, default=None, metavar="FILE",
                       help="channel (backward) model checkpoint scoring "
                       "P(source | hypo)")
    group.add_argument("--lm-path", type=str, default=None, metavar="FILE",
                       help="language model checkpoint scoring P(hypo)")
    group.add_argument("--num-rescore", type=int, default=10, metavar="N",
                       help="n-best size to rescore (also the beam)")
    group.add_argument("--weight1", type=float, default=1.0,
                       help="weight on the forward model score")
    group.add_argument("--weight2", type=float, default=1.0,
                       help="weight on the channel model score")
    group.add_argument("--weight3", type=float, default=1.0,
                       help="weight on the LM score")
    group.add_argument("--normalize", action="store_true",
                       help="per-length normalize each component")
    group.add_argument("--tune", action="store_true",
                       help="random-search weights/lenpen for best BLEU "
                       "(rerank_tune role)")
    group.add_argument("--tune-iterations", type=int, default=25)
    group.add_argument("--weight1-range", type=_float_pair, default=(0.5, 2.0))
    group.add_argument("--weight2-range", type=_float_pair, default=(0.0, 2.0))
    group.add_argument("--weight3-range", type=_float_pair, default=(0.0, 2.0))
    group.add_argument("--lenpen-range", type=_float_pair, default=(0.5, 1.5))
    return group


def cli_main(input_args=None):
    parser = options.get_generation_parser(default_task="translation")
    add_rerank_args(parser)
    args = options.parse_args_and_arch(parser, input_args)
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    return rerank_main(args)


if __name__ == "__main__":
    cli_main()
