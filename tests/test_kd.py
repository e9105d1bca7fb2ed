"""Knowledge distillation end-to-end: teacher training -> generate_topk
teacher dump -> KD student training (reference KD pipeline, CliC-IT 2020)."""

import os

import numpy as np

from fbk_fairseq_st_tpu.cli import generate_topk as topk_cli
from fbk_fairseq_st_tpu.cli import train as train_cli
from fbk_fairseq_st_tpu.data.knowledge_distillation import TeacherOutputDataset

from .test_st_ctc import create_st_data

COMMON = [
    "-s", "en", "-t", "de",
    "--arch", "conv_transformer",
    "--optimizer", "adam", "--lr", "0.001",
    "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
    "--max-tokens", "400", "--max-epoch", "1",
    "--encoder-layers", "2", "--decoder-layers", "2",
    "--encoder-embed-dim", "16", "--decoder-embed-dim", "16",
    "--encoder-ffn-embed-dim", "32", "--decoder-ffn-embed-dim", "32",
    "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
    "--encoder-convolutions", "[(4, 3, 3)] * 2",
    "--input-feat-per-channel", "8",
    "--max-source-positions", "64", "--max-target-positions", "32",
    "--log-format", "none",
]


def test_kd_pipeline(tmp_path):
    data_dir = str(tmp_path / "data")
    teacher_dir = str(tmp_path / "teacher")
    student_dir = str(tmp_path / "student")
    create_st_data(data_dir, n=8)

    # 1) teacher
    train_cli.cli_main(
        [data_dir, "--save-dir", teacher_dir,
         "--task", "speech_translation_with_transcription",
         "--criterion", "label_smoothed_cross_entropy",
         "--label-smoothing", "0.1"] + COMMON
    )

    # 2) teacher top-k dumps for train and valid
    for subset in ("train", "valid"):
        topk_cli.cli_main(
            [data_dir,
             "--task", "speech_translation_with_transcription",
             "--path", os.path.join(teacher_dir, "checkpoint_last.pt"),
             "--gen-subset", subset,
             "--distill-topk", "4",
             "--max-tokens", "400",
             "--log-format", "none"] + COMMON[:4]
        )
        for ext in ("idx", "out"):
            assert os.path.exists(
                os.path.join(data_dir, f"{subset}.de.top4_{ext}.bin")
            )

    # teacher outputs parse back with the right shapes
    ds = TeacherOutputDataset(
        os.path.join(data_dir, "train.de.top4_idx"), np.int32
    )
    item = ds[0]
    assert item.ndim == 2 and item.shape[1] == 4

    # 3) student with KD
    train_cli.cli_main(
        [data_dir, "--save-dir", student_dir,
         "--task", "speech_translation_with_transcription_kd",
         "--distill-topk", "4",
         "--criterion", "knowledge_distillation",
         "--kd-lambda", "0.5", "--kd-temperature", "2.0"] + COMMON
    )
    assert "checkpoint_last.pt" in os.listdir(student_dir)
