"""Grouped argparse parsers + the two-pass parse (reference
fairseq/options.py).

``parse_args_and_arch`` (:81-196 in the reference) parses once to learn
--task/--arch/--criterion/--optimizer/--lr-scheduler, adds that component's
flags, parses again, then applies the architecture preset so checkpointed
args namespaces match the fork's.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from . import registry


def get_preprocessing_parser(default_task="translation"):
    parser = get_parser("Preprocessing", default_task)
    add_preprocess_args(parser)
    return parser


def get_training_parser(default_task="speech_recognition"):
    parser = get_parser("Trainer", default_task)
    add_dataset_args(parser, train=True)
    add_distributed_training_args(parser)
    add_model_args(parser)
    add_optimization_args(parser)
    add_checkpoint_args(parser)
    return parser


def get_generation_parser(interactive=False, default_task="speech_recognition"):
    parser = get_parser("Generation", default_task)
    add_dataset_args(parser, gen=True)
    add_generation_args(parser)
    if interactive:
        add_interactive_args(parser)
    return parser


def get_interactive_generation_parser(default_task="speech_recognition"):
    return get_generation_parser(interactive=True, default_task=default_task)


def get_eval_lm_parser(default_task="language_modeling"):
    parser = get_parser("Evaluate Language Model", default_task)
    add_dataset_args(parser, gen=True)
    add_distributed_training_args(parser)
    add_eval_lm_args(parser)
    return parser


def get_validation_parser(default_task="speech_recognition"):
    parser = get_parser("Validation", default_task)
    add_dataset_args(parser, train=True)
    group = parser.add_argument_group("Evaluation")
    add_common_eval_args(group)
    return parser


def eval_str_list(x, type=float):
    if x is None:
        return None
    if isinstance(x, str):
        import ast

        x = ast.literal_eval(x)
    try:
        return list(map(type, x))
    except TypeError:
        return [type(x)]


def get_parser(desc: str, default_task: str = "speech_recognition"):
    parser = argparse.ArgumentParser(allow_abbrev=False, description=desc)
    # common args (reference options.py get_parser)
    parser.add_argument("--no-progress-bar", action="store_true", help="disable progress bar")
    parser.add_argument("--log-interval", type=int, default=100, metavar="N",
                        help="log progress every N batches")
    parser.add_argument("--log-format", default=None,
                        choices=["json", "none", "simple", "tqdm"])
    parser.add_argument("--profile", action="store_true", default=False,
                        help="record a jax.profiler trace of the run to "
                             "<save-dir>/profile (view in TensorBoard)")
    parser.add_argument("--use-pallas-attention", action="store_true",
                        default=False,
                        help="force the fused Pallas flash-attention path "
                             "even off-TPU (default: auto — ON on TPU "
                             "backends, OFF elsewhere)")
    parser.add_argument("--no-pallas-attention", action="store_true",
                        default=False,
                        help="disable the Pallas flash-attention path "
                             "(fall back to the XLA formulation everywhere)")
    parser.add_argument("--prng-impl", default="rbg",
                        choices=["rbg", "threefry2x32"],
                        help="PRNG for dropout masks: rbg rides the TPU "
                             "hardware RNG (fast), threefry2x32 is bitwise "
                             "reproducible across backends")
    parser.add_argument("--device-prefetch", type=int, default=2, metavar="N",
                        help="stage N collated batches on device ahead of "
                             "the step (0 disables)")
    parser.add_argument("--log-sync-interval", type=int, default=1, metavar="N",
                        help="sync logging outputs to host every N updates "
                             "(>1 overlaps host dispatch with device compute; "
                             "NaN detection then also runs every N updates)")
    parser.add_argument("--steps-per-execution", type=int, default=1,
                        metavar="K",
                        help="fuse K optimizer updates into ONE compiled "
                             "dispatch (lax.scan over K batches): amortizes "
                             "per-step host dispatch latency on slow-host / "
                             "tunneled setups. Requires update-freq 1; "
                             "groups whose batches differ in shape fall "
                             "back to per-step dispatch transparently")
    parser.add_argument("--tensorboard-logdir", metavar="DIR", default="",
                        help="path to save logs for tensorboard")
    parser.add_argument("--seed", default=1, type=int, metavar="N",
                        help="pseudo random number generator seed")
    parser.add_argument("--cpu", action="store_true", help="use CPU instead of TPU")
    parser.add_argument("--jax-cache-dir", metavar="DIR", default=None,
                        help="enable XLA's persistent compilation cache at "
                             "DIR: repeat runs (and restarts after "
                             "preemption) skip recompiles of unchanged "
                             "programs")
    parser.add_argument("--fp16", action="store_true",
                        help="use mixed precision (bfloat16 on TPU)")
    parser.add_argument("--bf16", action="store_true",
                        help="use bfloat16 compute (params stay fp32)")
    # fp16 loss-scaler parity flags (reference options.py:30-45): accepted
    # so fork commands run unmodified, ignored because bf16 keeps fp32's
    # exponent range and needs no scaler
    parser.add_argument("--memory-efficient-fp16", action="store_true",
                        help="parity flag; same as --fp16 here")
    parser.add_argument("--fp16-no-flatten-grads", action="store_true",
                        help="parity flag; gradients are never flattened "
                             "here (they live in the jitted update)")
    parser.add_argument("--fp16-init-scale", type=float, default=None,
                        help="parity flag; no loss scaler under bf16")
    parser.add_argument("--fp16-scale-window", type=int, default=None,
                        help="parity flag; no loss scaler under bf16")
    parser.add_argument("--fp16-scale-tolerance", type=float, default=None,
                        help="parity flag; no loss scaler under bf16")
    parser.add_argument("--min-loss-scale", type=float, default=None,
                        help="parity flag; no loss scaler under bf16")
    parser.add_argument("--threshold-loss-scale", type=float, default=None,
                        help="parity flag; no loss scaler under bf16")
    parser.add_argument("--user-dir", default=None,
                        help="path to a python module containing custom "
                        "extensions (tasks and/or architectures)")
    parser.add_argument("--empty-cache-freq", default=0, type=int,
                        help="how often to clear the XLA compilation cache (unused; parity flag)")
    parser.add_argument("--all-gather-list-size", default=16384, type=int,
                        help="parity flag (reference options.py:239): stats "
                             "reduce as psum'd scalar structs here — there "
                             "is no pickle buffer to size")
    parser.add_argument("--model-parallel-size", type=int, metavar="N",
                        default=1,
                        help="size of the 'model' mesh axis (tensor "
                             "parallelism); the reference's Megatron "
                             "partition count (options.py:241)")
    parser.add_argument("--checkpoint-suffix", default="",
                        help="suffix to add to the checkpoint file name "
                             "before .pt (reference options.py:244)")
    parser.add_argument("--quantization-config-path", default=None,
                        help="path to a quantization config (reference "
                             "options.py:246) driving in-training iterative "
                             "product quantization (see quantization/)")
    parser.add_argument("--tokenizer", default=None,
                        choices=sorted(registry.TOKENIZERS.keys()),
                        help="tokenizer applied to raw text before BPE "
                             "(interactive/hub input processing)")
    parser.add_argument("--bpe", default=None,
                        choices=sorted(registry.BPES.keys()),
                        help="subword codec applied after the tokenizer "
                             "(interactive/hub input processing)")
    parser.add_argument("--task", metavar="TASK", default=default_task,
                        help="task")
    parser.add_argument("--criterion", default="cross_entropy",
                        metavar="CRIT")
    parser.add_argument("--optimizer", default="nag", metavar="OPT")
    parser.add_argument("--lr-scheduler", default="fixed", metavar="SCHED")
    return parser


def add_preprocess_args(parser):
    group = parser.add_argument_group("Preprocessing")
    group.add_argument("-s", "--source-lang", default=None, metavar="SRC")
    group.add_argument("-t", "--target-lang", default=None, metavar="TARGET")
    group.add_argument("--trainpref", metavar="FP", default=None)
    group.add_argument("--validpref", metavar="FP", default=None)
    group.add_argument("--testpref", metavar="FP", default=None)
    group.add_argument("--destdir", metavar="DIR", default="data-bin")
    group.add_argument("--thresholdtgt", metavar="N", default=0, type=int)
    group.add_argument("--thresholdsrc", metavar="N", default=0, type=int)
    group.add_argument("--tgtdict", metavar="FP", default=None)
    group.add_argument("--srcdict", metavar="FP", default=None)
    group.add_argument("--nwordstgt", metavar="N", default=-1, type=int)
    group.add_argument("--nwordssrc", metavar="N", default=-1, type=int)
    group.add_argument("--align-suffix", metavar="FP", default=None,
                       help="alignment file suffix: binarize "
                            "{train,valid,test}pref.SUFFIX (Pharaoh 'si-ti' "
                            "pairs) into {split}.align.src-tgt datasets "
                            "consumed by --load-alignments training")
    group.add_argument("--alignfile", metavar="ALIGN", default=None,
                       help="train-split alignment file: build the "
                            "alignment.src-tgt.txt dictionary (most-frequent "
                            "target word per source word) used by "
                            "--replace-unk")
    group.add_argument("--only-source", action="store_true")
    group.add_argument("--padding-factor", metavar="N", default=8, type=int)
    group.add_argument("--dataset-impl", metavar="FORMAT", default="mmap",
                       choices=["raw", "lazy", "cached", "mmap"])
    group.add_argument("--joined-dictionary", action="store_true")
    group.add_argument("--workers", metavar="N", default=1, type=int)
    return group


def add_dataset_args(parser, train=False, gen=False):
    group = parser.add_argument_group("Dataset and data loading")
    group.add_argument("--num-workers", default=1, type=int, metavar="N",
                       help="how many subprocesses to use for data loading")
    group.add_argument("--skip-invalid-size-inputs-valid-test", action="store_true",
                       help="ignore too-long or too-short lines in valid and test set")
    group.add_argument("--max-tokens", type=int, metavar="N",
                       help="maximum number of tokens in a batch")
    group.add_argument("--max-sentences", "--batch-size", type=int, metavar="N",
                       help="maximum number of sentences in a batch")
    group.add_argument("--required-batch-size-multiple", default=8, type=int, metavar="N",
                       help="batch size will be a multiplier of this value")
    group.add_argument("--dataset-impl", metavar="FORMAT",
                       choices=["raw", "lazy", "cached", "mmap"],
                       help="output dataset implementation")
    group.add_argument("--data-buffer-size", default=2, type=int,
                       help="number of batches to preload")
    if train:
        group.add_argument("--train-subset", default="train", metavar="SPLIT",
                           help="data subset to use for training")
        group.add_argument("--valid-subset", default="valid", metavar="SPLIT",
                           help="comma separated list of data subsets to use for validation")
        group.add_argument("--validate-interval", type=int, default=1, metavar="N",
                           help="validate every N epochs")
        group.add_argument("--fixed-validation-seed", default=None, type=int, metavar="N")
        group.add_argument("--disable-validation", action="store_true")
        group.add_argument("--max-tokens-valid", type=int, metavar="N")
        group.add_argument("--max-sentences-valid", type=int, metavar="N")
        group.add_argument("--curriculum", default=0, type=int, metavar="N")
    if gen:
        group.add_argument("--gen-subset", default="test", metavar="SPLIT",
                           help="data subset to generate (train, valid, test)")
        group.add_argument("--num-shards", default=1, type=int, metavar="N")
        group.add_argument("--shard-id", default=0, type=int, metavar="ID")
    return group


def add_distributed_training_args(parser):
    group = parser.add_argument_group("Distributed training")
    group.add_argument("--distributed-world-size", type=int, metavar="N",
                       default=None, help="total number of chips (default: all)")
    group.add_argument("--distributed-rank", default=0, type=int)
    group.add_argument("--dcn-data-parallel", type=int, default=1,
                       metavar="N",
                       help="multi-slice pods: number of TPU slices; adds "
                       "an outer 'dcn' mesh axis so the batch (and its "
                       "gradient all-reduce) decomposes hierarchically — "
                       "ICI inside each slice, one DCN hop across — while "
                       "--fsdp / --model-parallel-size shardings stay "
                       "intra-slice (params replicated across slices)")
    group.add_argument("--fsdp", default=False, action="store_true",
                       help="ZeRO-3 fully-sharded data parallelism: shard "
                       "params + optimizer state over the 'data' mesh axis "
                       "(composes with --model-parallel-size)")
    group.add_argument("--fsdp-min-shard-size", type=int, default=None,
                       metavar="N", help="replicate params smaller than N "
                       "elements instead of sharding them (default 4096)")
    group.add_argument("--sequence-parallel", default=False,
                       action="store_true",
                       help="Megatron-SP: with --model-parallel-size > 1, "
                       "shard the LayerNorm/dropout/residual activation "
                       "segments over the TIME axis across the 'model' "
                       "mesh axis (activation memory / TP-degree; the "
                       "boundary all-reduces become reduce-scatter + "
                       "all-gather pairs, same volume)")
    group.add_argument("--ring-attention", default=False,
                       action="store_true",
                       help="context parallelism: with --model-parallel-"
                       "size > 1, run self-attention sequence-sharded "
                       "over the 'model' mesh axis with K/V blocks "
                       "rotating via ppermute (ring attention, "
                       "arXiv:2310.01889) — no device materializes the "
                       "full (T, S) scores or full-length K/V, extending "
                       "trainable context past one chip's HBM; composes "
                       "with --sequence-parallel, whose time-sharded "
                       "layout the attention then consumes directly")
    group.add_argument("--ddp-backend", default="pjit", help="parity flag; always pjit")
    # torch-DDP machinery parity flags (reference options.py:361-424):
    # accepted so fork launch commands run unmodified; they configure
    # NCCL/Gloo process groups and DDP wrappers that have no counterpart
    # under SPMD (XLA compiles the collectives into the step program)
    group.add_argument("--distributed-backend", default="pjit", metavar="BACKEND",
                       help="parity flag; collectives are XLA-compiled")
    group.add_argument("--distributed-init-method", default=None,
                       help="tcp://HOST:PORT is accepted as an alias for "
                            "--distributed-coordinator (reference env:// "
                            "init has no counterpart: processes are "
                            "launched explicitly)")
    group.add_argument("--distributed-port", default=-1, type=int,
                       help="parity flag; encode the port in "
                            "--distributed-coordinator instead")
    group.add_argument("--device-id", "--local_rank", default=0, type=int,
                       help="parity flag; use --distributed-local-device-ids "
                            "to pin chips to a process")
    group.add_argument("--distributed-no-spawn", action="store_true",
                       help="parity flag; one process per HOST is the only "
                            "launch mode (never one per chip)")
    group.add_argument("--nprocs-per-node", type=int, default=None,
                       help="parity flag; a process drives all its local "
                            "chips")
    group.add_argument("--fix-batches-to-gpus", action="store_true",
                       help="parity flag; batches shard deterministically "
                            "over the 'data' axis every step")
    group.add_argument("--bucket-cap-mb", default=25, type=int, metavar="MB",
                       help="parity flag; gradient all-reduce is fused by "
                            "XLA, not bucketed by bytes")
    group.add_argument("--broadcast-buffers", action="store_true",
                       help="parity flag; module buffers are part of the "
                            "replicated model_state")
    group.add_argument("--find-unused-parameters", action="store_true",
                       help="parity flag; unused params get zero grads from "
                            "jax.grad, no detection pass needed")
    group.add_argument("--fast-stat-sync", action="store_true",
                       help="parity flag; stat sync is always the fast "
                            "psum'd-scalars path")
    group.add_argument("--distributed-wrapper", default="DDP",
                       choices=["DDP", "SlowMo"],
                       help="parity flag; SlowMo's gossip dependency is "
                            "external in the reference too — use --use-bmuf "
                            "with the local-step schedule (optim/local_sgd) "
                            "for communication-efficient training here")
    group.add_argument("--slowmo-momentum", default=None, type=float,
                       help="parity flag; see --block-momentum (BMUF)")
    group.add_argument("--slowmo-algorithm", default="LocalSGD",
                       choices=["LocalSGD", "SGP"],
                       help="parity flag; see --distributed-wrapper")
    group.add_argument("--localsgd-frequency", default=3, type=int,
                       help="parity flag; see --global-sync-iter (BMUF "
                            "local-step schedule)")
    # multi-host (multi-process) launch: one CLI process per host drives its
    # local chips; jax.distributed.initialize stitches them into one mesh
    # (the counterpart of the reference's env:///SLURM init,
    # distributed_utils.py:30-77). Leave all three unset on one host.
    group.add_argument("--distributed-coordinator", default=None,
                       metavar="HOST:PORT",
                       help="coordinator address for multi-host training "
                       "(reference --distributed-init-method)")
    group.add_argument("--distributed-num-processes", type=int, default=None,
                       metavar="N", help="number of launcher processes "
                       "(hosts); auto-detected on SLURM/TPU pods when only "
                       "--distributed-coordinator is given")
    group.add_argument("--distributed-process-id", type=int, default=None,
                       metavar="I", help="this process's id in [0, N)")
    group.add_argument("--distributed-local-device-ids", default=None,
                       metavar="IDS", help="comma-separated local device ids "
                       "this process should drive (default: all local)")
    return group


def add_optimization_args(parser):
    group = parser.add_argument_group("Optimization")
    group.add_argument("--max-epoch", "--me", default=0, type=int, metavar="N",
                       help="force stop training at specified epoch")
    group.add_argument("--max-update", "--mu", default=0, type=int, metavar="N",
                       help="force stop training at specified update")
    group.add_argument("--clip-norm", default=25, type=float, metavar="NORM",
                       help="clip threshold of gradients")
    group.add_argument("--sentence-avg", action="store_true",
                       help="normalize gradients by the number of sentences in a batch"
                       " (default is to normalize by number of tokens)")
    group.add_argument("--update-freq", default="1", metavar="N1,N2,...,N_K",
                       type=lambda uf: eval_str_list(uf, type=int),
                       help="update parameters every N_i batches, when in epoch i")
    group.add_argument("--lr", "--learning-rate", default="0.25", metavar="LR_1,LR_2,...,LR_N",
                       type=lambda lr: eval_str_list(lr, type=float),
                       help="learning rate for the first N epochs")
    group.add_argument("--min-lr", default=-1, type=float, metavar="LR",
                       help="stop training when the learning rate reaches this minimum")
    group.add_argument("--use-bmuf", default=False, action="store_true")
    from .optim.bmuf import add_bmuf_args

    add_bmuf_args(group)
    return group


def add_checkpoint_args(parser):
    group = parser.add_argument_group("Checkpointing")
    group.add_argument("--save-dir", metavar="DIR", default="checkpoints",
                       help="path to save checkpoints")
    group.add_argument("--restore-file", default="checkpoint_last.pt",
                       help="filename from which to load checkpoint")
    group.add_argument("--reset-dataloader", action="store_true")
    group.add_argument("--reset-lr-scheduler", action="store_true")
    group.add_argument("--allow-partial-restore", action="store_true",
                       help="restore the model even if the checkpoint does "
                            "not match the architecture exactly: params "
                            "missing from the checkpoint keep their fresh "
                            "initialization (FBK fork flag, reference "
                            "options.py:464)")
    group.add_argument("--reset-meters", action="store_true")
    group.add_argument("--reset-optimizer", action="store_true")
    group.add_argument("--optimizer-overrides", default="{}", type=str, metavar="DICT")
    group.add_argument("--save-interval", type=int, default=1, metavar="N",
                       help="save a checkpoint every N epochs")
    group.add_argument("--save-interval-updates", type=int, default=0, metavar="N",
                       help="save a checkpoint (and validate) every N updates")
    group.add_argument("--keep-interval-updates", type=int, default=-1, metavar="N")
    group.add_argument("--keep-last-epochs", type=int, default=-1, metavar="N")
    group.add_argument("--keep-best-checkpoints", type=int, default=-1, metavar="N")
    group.add_argument("--no-save", action="store_true")
    group.add_argument("--no-epoch-checkpoints", action="store_true")
    group.add_argument("--no-last-checkpoints", action="store_true")
    group.add_argument("--save-on-interrupt", dest="save_on_interrupt",
                       action="store_true", default=True,
                       help="on SIGTERM/SIGINT, finish the in-flight "
                            "update, write checkpoint_last, and exit "
                            "cleanly — preemption-safe training on "
                            "spot/preemptible TPU pods (default on)")
    group.add_argument("--no-save-on-interrupt", dest="save_on_interrupt",
                       action="store_false")
    group.add_argument("--no-save-optimizer-state", action="store_true")
    group.add_argument("--best-checkpoint-metric", type=str, default="loss")
    group.add_argument("--maximize-best-checkpoint-metric", action="store_true")
    group.add_argument("--patience", type=int, default=-1, metavar="N",
                       help="early stop training if valid performance doesn't "
                       "improve for N consecutive validation runs")
    group.add_argument("--checkpoint-format", choices=["pickle", "sharded"],
                       default="pickle",
                       help="pickle = single-file host-gathered dict (fork-"
                       "style tooling works on it); sharded = per-shard "
                       "directory layout where each host writes only the "
                       "shards it owns (the multi-chip/multi-host format)")
    group.add_argument("--async-checkpoint", action="store_true",
                       help="write checkpoint files on a background thread "
                       "(device->host snapshot stays synchronous); sharded "
                       "format only")
    return group


def add_model_args(parser):
    group = parser.add_argument_group("Model configuration")
    group.add_argument("--arch", "-a", default="fconv", metavar="ARCH",
                       help="model architecture")
    return group


def add_common_eval_args(group):
    """Reference options.py add_common_eval_args — shared by generation,
    validation and eval_lm parsers."""
    group.add_argument("--path", metavar="FILE",
                       help="path(s) to model file(s), colon separated")
    group.add_argument("--remove-bpe", "--post-process", nargs="?", const="@@ ",
                       default=None, help="remove BPE tokens before scoring")
    group.add_argument("--quiet", action="store_true",
                       help="only print final scores")
    group.add_argument("--model-overrides", default="{}", type=str, metavar="DICT")
    group.add_argument("--results-path", metavar="RESDIR", type=str, default=None)


def add_eval_lm_args(parser):
    group = parser.add_argument_group("LM Evaluation")
    add_common_eval_args(group)
    group.add_argument("--output-word-probs", action="store_true",
                       help="print each word with its predicted log "
                            "probability to standard output")
    group.add_argument("--output-word-stats", action="store_true",
                       help="print per-word statistics (count, average "
                            "probability) sorted by count")
    group.add_argument("--context-window", default=0, type=int, metavar="N",
                       help="score each token with this many tokens of "
                            "preceding context carried across batch "
                            "boundaries (reference eval_lm --context-window)")
    group.add_argument("--softmax-batch", default=sys.maxsize, type=int,
                       metavar="N",
                       help="parity flag (reference GPU memory control): "
                            "the jitted scorer streams the softmax "
                            "reduction, nothing to batch")
    return group


def add_generation_args(parser):
    group = parser.add_argument_group("Generation")
    add_common_eval_args(group)
    group.add_argument("--quantize-weights", choices=["none", "int8"],
                       default="none",
                       help="weight-only quantization of linear layers for "
                       "serving: int8 storage + per-channel scales, "
                       "dequantized at the matmul (4x smaller weight "
                       "memory, latency-neutral; PERF.md)")
    group.add_argument("--beam", default=5, type=int, metavar="N",
                       help="beam size")
    group.add_argument("--nbest", default=1, type=int, metavar="N",
                       help="number of hypotheses to output")
    group.add_argument("--max-len-a", default=0, type=float, metavar="N")
    group.add_argument("--max-len-b", default=200, type=int, metavar="N",
                       help="generate sequences of maximum length ax + b")
    group.add_argument("--min-len", default=1, type=float, metavar="N")
    group.add_argument("--match-source-len", default=False, action="store_true")
    group.add_argument("--no-early-stop", action="store_true")
    group.add_argument("--unnormalized", action="store_true",
                       help="compare unnormalized hypothesis scores")
    group.add_argument("--no-beamable-mm", action="store_true")
    group.add_argument("--lenpen", default=1, type=float,
                       help="length penalty: >1.0 favors longer sentences")
    group.add_argument("--unkpen", default=0, type=float,
                       help="unknown word penalty")
    group.add_argument("--replace-unk", nargs="?", const=True, default=None)
    group.add_argument("--sacrebleu", action="store_true",
                       help="score with sacrebleu")
    group.add_argument("--score-reference", action="store_true",
                       help="just score the reference translation")
    group.add_argument("--prefix-size", default=0, type=int, metavar="PS",
                       help="initialize generation by target prefix of given length")
    group.add_argument("--iter-decode-max-iter", default=10, type=int, metavar="N",
                        help="maximum refinement iterations for NAT decoding")
    group.add_argument("--iter-decode-eos-penalty", default=0.0, type=float, metavar="N",
                        help="eos penalty for levenshtein placeholder insertion")
    group.add_argument("--iter-decode-force-max-iter", action="store_true",
                       help="run exactly the maximum number of refinement "
                            "iterations (the fixed-shape NAT loop always "
                            "does — accepted so reference commands run "
                            "unmodified)")
    group.add_argument("--iter-decode-with-beam", default=1, type=int, metavar="N",
                       help="decode N length-beam candidates per sentence "
                            "(top-N predicted lengths) and keep the best "
                            "by average token score")
    group.add_argument("--iter-decode-with-external-reranker", action="store_true",
                       help="assume the last --path checkpoint is an "
                            "autoregressive reranker: rescore the length-"
                            "beam candidates teacher-forced and pick the "
                            "best (requires --iter-decode-with-beam > 1)")
    group.add_argument("--retain-iter-history", action="store_true",
                       help="return every refinement iteration's tokens "
                            "(printed as E-id_step lines by generate)")
    group.add_argument("--decoding-format", default=None, type=str,
                       choices=["unigram", "ensemble", "vote", "dp", "bs"],
                       help="parity flag (reference options.py:607): passed "
                            "through to the NAT models, which ignore it — "
                            "as they do in the reference")
    group.add_argument("--no-repeat-ngram-size", default=0, type=int, metavar="N",
                       help="ngram blocking such that this size ngram cannot be repeated")
    group.add_argument("--sampling", action="store_true",
                       help="sample hypotheses instead of using beam search")
    group.add_argument("--sampling-topk", default=-1, type=int, metavar="PS",
                       help="sample from top K likely next words")
    group.add_argument("--sampling-topp", default=-1.0, type=float, metavar="PS",
                       help="sample from the smallest set of words whose cumulative "
                       "probability mass exceeds p")
    group.add_argument("--temperature", default=1.0, type=float, metavar="N",
                       help="temperature for generation")
    group.add_argument("--diverse-beam-groups", default=-1, type=int, metavar="N")
    group.add_argument("--diverse-beam-strength", default=0.5, type=float, metavar="N")
    group.add_argument("--diversity-rate", default=-1.0, type=float, metavar="N")
    group.add_argument("--print-alignment", action="store_true")
    group.add_argument("--print-step", action="store_true")
    return group


def add_interactive_args(parser):
    group = parser.add_argument_group("Interactive")
    group.add_argument("--buffer-size", default=0, type=int, metavar="N")
    group.add_argument("--input", default="-", type=str, metavar="FILE")
    return group


class _TolerantParser:
    """add_argument that skips flags already registered elsewhere (e.g.
    wav2vec's and binary_cross_entropy's shared --infonce) instead of
    aborting the whole component's registration."""

    def __init__(self, parser):
        self._parser = parser

    def add_argument(self, *a, **k):
        try:
            return self._parser.add_argument(*a, **k)
        except argparse.ArgumentError:
            return None

    def __getattr__(self, name):
        return getattr(self._parser, name)


def parse_args_and_arch(
    parser: argparse.ArgumentParser,
    input_args: Optional[List[str]] = None,
    parse_known: bool = False,
):
    """Two-pass parse (reference options.py:81-196)."""
    # eagerly import --user-dir components so their registrations exist
    usr_parser = argparse.ArgumentParser(add_help=False, allow_abbrev=False)
    usr_parser.add_argument("--user-dir", default=None)
    usr_args, _ = usr_parser.parse_known_args(input_args)
    from .utils.user_dir import import_user_module

    import_user_module(usr_args)

    # 1st pass: learn component choices
    args, _ = parser.parse_known_args(input_args)

    # add model-specific args into a SUPPRESS group: unset flags never enter
    # the namespace, so arch presets' getattr back-fill works (reference
    # options.py:134-141)
    if hasattr(args, "arch") and (
        args.arch in registry.ARCHITECTURES or args.arch in registry.MODELS
    ):
        model_specific_group = parser.add_argument_group(
            "Model-specific configuration",
            argument_default=argparse.SUPPRESS,
        )
        if args.arch in registry.ARCHITECTURES:
            model_name, _ = registry.ARCHITECTURES[args.arch]
        else:
            model_name = args.arch
        registry.MODELS[model_name].add_args(model_specific_group)

    # add component args
    for registry_obj, attr in [
        (registry.TASKS, "task"),
        (registry.CRITERIONS, "criterion"),
        (registry.OPTIMIZERS, "optimizer"),
        (registry.LR_SCHEDULERS, "lr_scheduler"),
        (registry.TOKENIZERS, "tokenizer"),
        (registry.BPES, "bpe"),
    ]:
        name = getattr(args, attr, None)
        if name is not None and name in registry_obj:
            registry_obj.add_args(name, _TolerantParser(parser))

    # composite criterions (ctc_multi_loss) delegate to an underlying
    # criterion whose flags must also be parseable
    args2, _ = parser.parse_known_args(input_args)
    underlying = getattr(args2, "underlying_criterion", None)
    if underlying and underlying in registry.CRITERIONS:
        group = parser.add_argument_group(
            "Underlying criterion configuration",
            argument_default=argparse.SUPPRESS,
        )
        try:
            registry.CRITERIONS.add_args(underlying, group)
        except argparse.ArgumentError:
            pass  # flag already registered by the outer criterion

    # 2nd pass
    if parse_known:
        args, extra = parser.parse_known_args(input_args)
    else:
        args = parser.parse_args(input_args)
        extra = None

    # apply arch defaults
    if getattr(args, "arch", None) in registry.ARCHITECTURES:
        registry.apply_architecture(args)

    if getattr(args, "no_pallas_attention", False):
        from .ops.attention import set_flash_attention

        set_flash_attention(False)
    elif getattr(args, "use_pallas_attention", False):
        from .ops.attention import set_flash_attention

        set_flash_attention(True)

    if getattr(args, "cpu", False):
        # the axon TPU plugin ignores the JAX_PLATFORMS env var, so --cpu
        # must go through jax.config (no-op if a backend is already live)
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    enable_compilation_cache(getattr(args, "jax_cache_dir", None))

    if parse_known:
        return args, extra
    return args


def enable_compilation_cache(cache_dir) -> None:
    """Point XLA's persistent compilation cache at ``cache_dir`` (expanded;
    created on demand). Saves have no semantic effect — the cache is keyed
    by the HLO/platform fingerprint — but repeat CLI invocations and
    post-preemption restarts skip the multi-minute compiles of the big
    train steps and beam-decode programs. 'none'/'' disables."""
    if not cache_dir or str(cache_dir).lower() == "none":
        return
    import os

    try:
        import jax

        path = os.path.expanduser(str(cache_dir))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (RuntimeError, OSError):
        # read-only home or an already-finalized jax config: run uncached
        pass
