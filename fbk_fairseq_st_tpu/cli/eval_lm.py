"""Evaluate a language model's perplexity (reference fairseq_cli/eval_lm.py):
teacher-forced NLL over the gen subset, loss in base 2 and perplexity."""

from __future__ import annotations

import logging
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import options
from ..registry import TASKS
from ..train import checkpoint as checkpoint_utils
from ..utils.user_dir import import_user_module

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=logging.INFO,
    stream=sys.stdout,
)
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.eval_lm")


def main(args):
    import_user_module(args)
    assert args.path is not None, "--path required for evaluation"
    if args.max_tokens is None and args.max_sentences is None:
        args.max_tokens = 36000

    context_window = getattr(args, "context_window", 0) or 0
    if context_window > 0:
        # shrink the scored window so window + context fits the model's
        # receptive field (reference fairseq_cli/eval_lm.py:91)
        args.tokens_per_sample -= context_window

    task = TASKS[args.task].setup_task(args)
    task.load_dataset(args.gen_subset)
    if context_window > 0:
        from ..data.monolingual import LMContextWindowDataset

        task.datasets[args.gen_subset] = LMContextWindowDataset(
            task.dataset(args.gen_subset),
            tokens_per_sample=args.tokens_per_sample,
            context_window=context_window,
            pad_idx=task.target_dictionary.pad(),
        )
    models, _ = checkpoint_utils.load_model_ensemble(
        args.path.split(":"), task=task
    )
    model, variables = models[0]
    d = task.target_dictionary

    itr = task.get_batch_iterator(
        dataset=task.dataset(args.gen_subset),
        max_tokens=args.max_tokens,
        max_sentences=args.max_sentences,
        max_positions=task.max_positions(),
        ignore_invalid_inputs=True,
        required_batch_size_multiple=args.required_batch_size_multiple,
        # exact batch-max padding (no shape bucketing): the audio conv
        # frontend is padding-sensitive past the first BatchNorm (as in the
        # fork), so bucket padding would change decode output vs the fork
        bucket_shapes=False,
    ).next_epoch_itr(shuffle=False)

    @jax.jit
    def nll_batch(batch):
        (logits, _), _ = model.forward(variables, batch, training=False)
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        target = batch["target"]
        nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
        mask = target != d.pad()
        return jnp.sum(nll * mask), jnp.sum(mask), nll * mask

    output_word_probs = getattr(args, "output_word_probs", False)
    output_word_stats = getattr(args, "output_word_stats", False)
    word_stats: dict = {}
    bpe_cont = (args.remove_bpe or "@@ ").rstrip()

    def emit_word_outputs(sample_ids, targets, per_tok_nll):
        # glue BPE pieces back into words (a piece whose symbol ends with
        # the continuation marker continues the word) and aggregate the
        # pieces' log-probs, reference fairseq_cli/eval_lm.py WordStat
        for sid, row, nll_row in zip(sample_ids, targets, per_tok_nll):
            words = []
            w, lp, is_bpe = "", 0.0, False
            for tok, nll_tok in zip(row, nll_row):
                if tok == d.pad():
                    continue
                sym = d[int(tok)]
                w += sym
                lp += -float(nll_tok)
                if sym.endswith(bpe_cont):
                    w = w[: -len(bpe_cont)]
                    is_bpe = True
                else:
                    words.append((w, lp, is_bpe))
                    w, lp, is_bpe = "", 0.0, False
            if w:
                words.append((w, lp, is_bpe))
            if output_word_probs:
                print(
                    str(int(sid))
                    + " "
                    + "\t".join(f"{w} [{lp:2f}]" for w, lp, _ in words)
                )
            if output_word_stats:
                for w, lp, wb in words:
                    st = word_stats.setdefault(w, [0, 0.0, wb])
                    st[0] += 1
                    st[1] += lp

    total_nll = 0.0
    total_tokens = 0
    for sample in itr:
        if len(sample) == 0:
            continue
        batch = {
            "src_tokens": jnp.asarray(sample["net_input"]["src_tokens"]),
            "src_lengths": jnp.asarray(sample["net_input"]["src_lengths"]),
            "target": jnp.asarray(sample["target"]),
        }
        nll, n, per_tok = jax.device_get(nll_batch(batch))
        total_nll += float(nll)
        total_tokens += int(n)
        if output_word_probs or output_word_stats:
            emit_word_outputs(sample["id"], sample["target"], per_tok)

    if output_word_stats:
        for w, (count, log_prob, wb) in sorted(
            word_stats.items(), key=lambda x: x[1][0], reverse=True
        ):
            suffix = " (is_bpe)" if wb else ""
            logger.info(
                f"{w}{suffix}: count={count} avg_log_prob={log_prob / count:.4f}"
            )

    avg_nll = total_nll / max(total_tokens, 1) / math.log(2)
    logger.info(
        "Evaluated {} tokens".format(total_tokens)
    )
    logger.info(
        "Loss (base 2): {:.4f}, Perplexity: {:.2f}".format(
            avg_nll, 2 ** avg_nll
        )
    )
    return avg_nll, total_tokens


def cli_main(input_args=None):
    parser = options.get_eval_lm_parser(default_task="language_modeling")
    args = options.parse_args_and_arch(parser, input_args)
    return main(args)


if __name__ == "__main__":
    cli_main()
