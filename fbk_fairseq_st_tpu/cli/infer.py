"""ASR inference CLI with sclite-format outputs.

Counterpart of examples/speech_recognition/infer.py:26-273: decodes the gen
subset and writes ``hypo.word-<ckpt>-<subset>.txt`` / ``hypo.units-...`` /
``ref.word-...`` / ``ref.units-...`` files in sclite trn format
("<sentence> (<utt_id>)"), with sentencepiece de-segmentation for the .word
files; WER is scored offline with sclite as in the reference.
"""

from __future__ import annotations

import ast
import logging
import os
import math
import sys

import numpy as np

from .. import options
from ..data.dictionary import post_process
from ..registry import TASKS
from ..train import checkpoint as checkpoint_utils
from ..train.meters import StopwatchMeter
from ..utils.user_dir import import_user_module

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=logging.INFO,
    stream=sys.stdout,
)
logger = logging.getLogger("fbk_fairseq_st_tpu.cli.infer")


def add_asr_eval_argument(parser):
    parser.add_argument("--ctc-decoding", nargs="?", const="greedy",
                        choices=["greedy", "beam"], default=None,
                        help="CTC decoding for encoder-only models: greedy "
                        "(best path) or beam (prefix beam search, optional "
                        "lexicon/LM)")
    parser.add_argument("--ctc-beam-size", type=int, default=32,
                        help="beam width for --ctc-decoding beam")
    parser.add_argument("--lexicon", help="wav2letter-format lexicon "
                        "(word<TAB>unit unit ...) constraining beam decodes")
    parser.add_argument("--kenlm-model", default=None,
                        help="word-level n-gram model scored at word "
                        "boundaries: ARPA text (.arpa[.gz]) loads natively; "
                        "KenLM binary files need the optional kenlm binding")
    parser.add_argument("--lm-weight", type=float, default=2.0)
    parser.add_argument("--word-score", type=float, default=-1.0)
    # reference examples/speech_recognition/infer.py:52-55 (flashlight
    # DecoderOptions tuning knobs)
    parser.add_argument("--beam-threshold", type=float, default=25.0,
                        help="prune beams scoring below best minus this")
    parser.add_argument("--unk-weight", type=float, default=-math.inf,
                        help="score for emitting <unk> at an "
                             "out-of-lexicon word boundary (-inf forbids)")
    parser.add_argument("--sil-weight", type=float, default=0.0,
                        help="score added per silence/word-boundary "
                             "transition")
    parser.add_argument("--word-boundary-unit", default="|",
                        help="dictionary unit delimiting words for the "
                        "lexicon decoder (wav2letter convention)")
    parser.add_argument("--kspmodel", default=None, help="sentence piece model")
    parser.add_argument("--wfstlm", default=None, help="wfstlm on dictonary output units")
    parser.add_argument("--rnnt_decoding_type", default="greedy")
    parser.add_argument("--rnnt_len_penalty", default=-0.5)
    parser.add_argument("--w2l-decoder", choices=["viterbi", "kenlm"],
                        help="w2l-style decoders, implemented natively: "
                        "viterbi = CTC best path; kenlm = lexicon-constrained "
                        "prefix beam search with a KenLM word LM (reference "
                        "w2l_decoder.py:84,:112)")
    return parser


def _sclite_line(sentence: str, utt_id) -> str:
    return f"{sentence} ({utt_id}-{utt_id})\n"


def process_predictions(args, hypos, tgt_dict, sample_id, res_files):
    best_words = best_pieces = None
    for hypo in hypos[: min(len(hypos), args.nbest)]:
        hyp_pieces = tgt_dict.string(hypo["tokens"])
        if hypo.get("words"):
            # lexicon decoder: word sequence comes from the lexicon itself
            hyp_words = " ".join(hypo["words"])
        else:
            hyp_words = post_process(hyp_pieces, "sentencepiece")
        res_files["hypo.units"].write(_sclite_line(hyp_pieces, sample_id))
        res_files["hypo.word"].write(_sclite_line(hyp_words, sample_id))
        if best_words is None:
            best_words, best_pieces = hyp_words, hyp_pieces
    return best_words, best_pieces


def process_references(args, target_tokens, tgt_dict, sample_id, res_files):
    tgt_pieces = tgt_dict.string(target_tokens, escape_unk=True)
    tgt_words = post_process(tgt_pieces, "sentencepiece")
    res_files["ref.units"].write(_sclite_line(tgt_pieces, sample_id))
    res_files["ref.word"].write(_sclite_line(tgt_words, sample_id))
    return tgt_words, tgt_pieces


def _edit_distance(ref, hyp) -> int:
    """Levenshtein over token lists (two-row DP; WER/UER numerator)."""
    if not ref or not hyp:
        return max(len(ref), len(hyp))
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (r != h)
            )
        prev = cur
    return prev[-1]


def prepare_result_files(args):
    def get_res_file(file_prefix):
        path = os.path.join(
            args.results_path,
            "{}-{}-{}.txt".format(
                file_prefix, os.path.basename(args.path), args.gen_subset
            ),
        )
        return open(path, "w", buffering=1, encoding="utf-8")

    os.makedirs(args.results_path, exist_ok=True)
    return {
        "hypo.word": get_res_file("hypo.word"),
        "hypo.units": get_res_file("hypo.units"),
        "ref.word": get_res_file("ref.word"),
        "ref.units": get_res_file("ref.units"),
    }


def main(args):
    assert args.path is not None, "--path required for generation!"
    assert args.results_path is not None, "--results-path required!"
    import_user_module(args)
    if args.max_tokens is None and args.max_sentences is None:
        args.max_tokens = 30000
    logger.info(args)

    task = TASKS[args.task].setup_task(args)
    task.load_dataset(args.gen_subset)
    logger.info(
        "| {} {} {} examples".format(
            args.data, args.gen_subset, len(task.dataset(args.gen_subset))
        )
    )
    models, _ = checkpoint_utils.load_model_ensemble(
        args.path.split(":"),
        arg_overrides=ast.literal_eval(args.model_overrides),
        task=task,
    )
    from ..quantization.weight_only import maybe_quantize_ensemble

    models = maybe_quantize_ensemble(models, args, logger)
    tgt_dict = task.target_dictionary

    # w2l-style decoders map onto the native CTC decoders: Viterbi over
    # pure-CTC emissions IS the best-path (greedy) decode; kenlm is the
    # lexicon-constrained prefix beam search (generation/ctc_decoder.py)
    w2l = getattr(args, "w2l_decoder", None)
    if w2l == "viterbi" and not args.ctc_decoding:
        args.ctc_decoding = "greedy"
    elif w2l == "kenlm":
        args.ctc_decoding = "beam"
        if not args.lexicon:
            raise ValueError("--w2l-decoder kenlm requires --lexicon")
        if not args.kenlm_model:
            raise ValueError(
                "--w2l-decoder kenlm requires --kenlm-model (for a "
                "lexicon-only beam use --ctc-decoding beam --lexicon ...)"
            )

    itr = task.get_batch_iterator(
        dataset=task.dataset(args.gen_subset),
        max_tokens=args.max_tokens,
        max_sentences=args.max_sentences,
        max_positions=task.max_positions(),
        ignore_invalid_inputs=args.skip_invalid_size_inputs_valid_test,
        required_batch_size_multiple=args.required_batch_size_multiple,
        # exact batch-max padding (no shape bucketing): the audio conv
        # frontend is padding-sensitive past the first BatchNorm (as in the
        # fork), so bucket padding would change decode output vs the fork
        bucket_shapes=False,
    ).next_epoch_itr(shuffle=False)

    gen_timer = StopwatchMeter()

    def build_ctc_decoder(mode: str):
        import jax
        import jax.numpy as jnp

        from ..ops.ctc import ctc_greedy_decode

        model, variables = models[0]
        # an ASG-trained model has no blank symbol; decode under ASG
        # scoring (learned transitions + replabels) instead of CTC
        asg_transitions = variables["params"].get("asg_transitions")
        blank = (
            tgt_dict.index("<ctc_blank>")
            if "<ctc_blank>" in tgt_dict
            else None
        )
        if blank is None and asg_transitions is None:
            raise ValueError(
                "--ctc-decoding needs either a <ctc_blank> symbol in the "
                "dictionary (CTC) or a model with asg_transitions (ASG)"
            )

        beam_decoder = None
        if mode == "beam":
            from ..generation.arpa_lm import load_word_lm
            from ..generation.ctc_decoder import (
                ASGBeamDecoder,
                CTCPrefixBeamDecoder,
                LexiconTrie,
            )

            trie = None
            boundary = None
            if args.lexicon:
                trie = LexiconTrie.from_lexicon_file(args.lexicon, tgt_dict)
                boundary = tgt_dict.index(args.word_boundary_unit)
            lm = load_word_lm(args.kenlm_model) if args.kenlm_model else None
            if asg_transitions is not None:
                beam_decoder = ASGBeamDecoder(
                    np.asarray(jax.device_get(asg_transitions)),
                    beam_size=args.ctc_beam_size,
                    trie=trie,
                    lm=lm,
                    lm_weight=args.lm_weight,
                    word_score=args.word_score,
                    word_boundary=boundary,
                )
            else:
                beam_decoder = CTCPrefixBeamDecoder(
                    blank=blank,
                    beam_size=args.ctc_beam_size,
                    trie=trie,
                    lm=lm,
                    lm_weight=args.lm_weight,
                    word_score=args.word_score,
                    word_boundary=boundary,
                    beam_threshold=args.beam_threshold,
                    unk_weight=args.unk_weight,
                    sil_weight=args.sil_weight,
                )

        def _emissions(sample):
            enc, _ = model.encode(
                variables,
                jnp.asarray(sample["net_input"]["src_tokens"]),
                jnp.asarray(sample["net_input"]["src_lengths"]),
            )
            logits = enc.ctc_out if enc.ctc_out is not None else enc.encoder_out
            lengths = (
                enc.ctc_lengths if enc.ctc_lengths is not None else enc.src_lengths
            )
            return logits, lengths

        def generate_greedy(models_, sample, prefix_tokens=None, **kw):
            logits, lengths = _emissions(sample)
            toks, counts = jax.device_get(
                ctc_greedy_decode(logits, lengths, blank)
            )
            out = []
            for i in range(toks.shape[0]):
                out.append(
                    [{
                        "tokens": toks[i, : counts[i]],
                        "score": 0.0,
                        "positional_scores": np.zeros(int(counts[i]), np.float32),
                        "alignment": None,
                        "attention": None,
                    }]
                )
            return out

        def generate_asg_viterbi(models_, sample, prefix_tokens=None, **kw):
            from ..data.replabels import unpack_replabels
            from ..ops.asg import asg_viterbi_decode

            logits, lengths = _emissions(sample)
            paths, scores = jax.device_get(
                asg_viterbi_decode(logits, asg_transitions, lengths)
            )
            lengths = np.asarray(jax.device_get(lengths))
            out = []
            for i in range(paths.shape[0]):
                path = paths[i, : lengths[i]].tolist()
                # ASG has no blank: collapse consecutive repeats, then
                # expand replabels (reference w2l Viterbi + post-process)
                collapsed = [
                    tok for j, tok in enumerate(path)
                    if j == 0 or tok != path[j - 1]
                ]
                tokens = unpack_replabels(
                    collapsed, tgt_dict, getattr(args, "max_replabel", 2)
                )
                out.append(
                    [{
                        "tokens": np.asarray(tokens, np.int64),
                        "score": float(scores[i]),
                        "positional_scores": np.zeros(len(tokens), np.float32),
                        "alignment": None,
                        "attention": None,
                    }]
                )
            return out

        def generate_beam(models_, sample, prefix_tokens=None, **kw):
            from ..generation.ctc_decoder import ctc_beam_decode_batch

            logits, lengths = _emissions(sample)
            if asg_transitions is not None:
                # ASG scores are unnormalized; no softmax. Replabels stay
                # packed through the search and are expanded afterwards.
                scores = jax.device_get(logits)
            else:
                scores = jax.device_get(jax.nn.log_softmax(logits, axis=-1))
            lengths = np.asarray(jax.device_get(lengths))
            out = []
            for hyps in ctc_beam_decode_batch(
                scores, lengths, beam_decoder, n_best=args.nbest
            ):
                if asg_transitions is not None:
                    from ..data.replabels import unpack_replabels

                    for h in hyps:
                        h["tokens"] = np.asarray(
                            unpack_replabels(
                                h["tokens"].tolist(), tgt_dict,
                                getattr(args, "max_replabel", 2),
                            ),
                            np.int64,
                        )
                out.append(
                    [{
                        "tokens": h["tokens"],
                        "score": h["score"],
                        "positional_scores": np.zeros(
                            len(h["tokens"]), np.float32
                        ),
                        "words": h.get("words"),
                        "alignment": None,
                        "attention": None,
                    } for h in hyps]
                )
            return out

        class _G:
            pass

        g = _G()
        if mode == "beam":
            g.generate = generate_beam
        elif asg_transitions is not None:
            g.generate = generate_asg_viterbi
        else:
            g.generate = generate_greedy
        return g

    if getattr(args, "ctc_decoding", None):
        generator = build_ctc_decoder(args.ctc_decoding)
    else:
        generator = task.build_generator(models, args)
    res_files = prepare_result_files(args)

    num_sentences = 0
    wer_errs = wer_total = uer_errs = uer_total = 0
    for sample in itr:
        if len(sample) == 0:
            continue
        prefix_tokens = None
        if args.prefix_size > 0:
            prefix_tokens = sample["target"][:, : args.prefix_size]
        gen_timer.start()
        hypos = task.inference_step(generator, models, sample, prefix_tokens)
        num_generated_tokens = sum(len(h[0]["tokens"]) for h in hypos if h)
        gen_timer.stop(num_generated_tokens)

        for i, sample_id in enumerate(np.asarray(sample["id"])):
            sample_id = int(sample_id)
            if sample_id < 0:
                continue
            ref_words = ref_pieces = None
            if sample["target"] is not None:
                target_tokens = np.asarray(sample["target"][i])
                target_tokens = target_tokens[target_tokens != tgt_dict.pad()]
                ref_words, ref_pieces = process_references(
                    args, target_tokens, tgt_dict, sample_id, res_files
                )
            hyp_words, hyp_pieces = process_predictions(
                args, hypos[i], tgt_dict, sample_id, res_files
            )
            if ref_words is not None and hyp_words is not None:
                wer_errs += _edit_distance(ref_words.split(), hyp_words.split())
                wer_total += len(ref_words.split())
                uer_errs += _edit_distance(ref_pieces.split(), hyp_pieces.split())
                uer_total += len(ref_pieces.split())
            num_sentences += 1

    logger.info(
        "| Processed {} sentences ({} tokens) in {:.1f}s ({:.2f} sentences/s, "
        "{:.2f} tokens/s)".format(
            num_sentences, gen_timer.n, gen_timer.sum,
            num_sentences / max(gen_timer.sum, 1e-6),
            1.0 / max(gen_timer.avg, 1e-9),
        )
    )
    wer = uer = None
    if wer_total > 0:
        # native corpus WER/UER over the best hypotheses — the reference
        # can only score offline with external sclite; the sclite-format
        # files are still written for byte-compatible offline workflows
        wer = 100.0 * wer_errs / wer_total
        uer = 100.0 * uer_errs / max(uer_total, 1)
        logger.info(
            "| WER: {:.2f}% ({}/{} word errors), UER: {:.2f}% "
            "({}/{} unit errors)".format(
                wer, wer_errs, wer_total, uer, uer_errs, uer_total
            )
        )
    logger.info(
        "| sclite-format hypo.word/ref.word files written for offline "
        "scoring (as in the reference)"
    )
    for f in res_files.values():
        f.close()
    return wer, uer


def cli_main(input_args=None):
    parser = options.get_generation_parser(default_task="speech_recognition")
    parser = add_asr_eval_argument(parser)
    args = options.parse_args_and_arch(parser, input_args)
    return main(args)


if __name__ == "__main__":
    cli_main()
