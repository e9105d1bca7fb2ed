#!/usr/bin/env bash
# Prepare the LibriSpeech dataset for the JSON speech route.
#
# Counterpart of the reference
# examples/speech_recognition/datasets/prepare-librispeech.sh:9-87, retargeted
# at this framework's CLIs: download -> merge train packs -> sentencepiece
# unigram BPE -> dictionary -> {train,valid,test-clean,test-other}.json via
# scripts/asr_prep_json.py (consumed by --task speech_recognition
# --dataset-from-json).
#
# Requires: wget, tar, sentencepiece (spm_train/spm_encode) for BPE; audio
# stays .flac, so durations need torchaudio OR pre-extracted --durations TSVs
# (LibriSpeech .wav conversions work without any audio backend).

set -euo pipefail

base_url=www.openslr.org/resources/12
train_dir=train_960

if [ "$#" -ne 2 ]; then
  echo "Usage: $0 <download_dir> <out_dir>"
  echo "e.g.: $0 /tmp/librispeech_raw/ ~/data/librispeech_final"
  exit 1
fi

download_dir=${1%/}
out_dir=${2%/}

repo_root="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "${out_dir}"
cd "${out_dir}"

nbpe=5000
bpemode=unigram

echo "Data Download"
for part in dev-clean test-clean dev-other test-other train-clean-100 train-clean-360 train-other-500; do
    url=$base_url/$part.tar.gz
    if [ ! -f "${download_dir}/${part}.tar.gz" ]; then
        wget -P "$download_dir" "$url"
    fi
    tar -C "$download_dir" -xzf "${download_dir}/${part}.tar.gz"
done

echo "Merge all train packs into one"
mkdir -p "${download_dir}/LibriSpeech/${train_dir}/"
for part in train-clean-100 train-clean-360 train-other-500; do
    mv "${download_dir}/LibriSpeech/${part}"/* "${download_dir}/LibriSpeech/${train_dir}/"
done
echo "Merge train text"
find "${download_dir}/LibriSpeech/${train_dir}/" -name '*.txt' -exec cat {} \; >> "${download_dir}/LibriSpeech/${train_dir}/text"

# combined dev-clean + dev-other as validation set
find "${download_dir}/LibriSpeech/dev-clean/" "${download_dir}/LibriSpeech/dev-other/" -name '*.txt' -exec cat {} \; >> "${download_dir}/LibriSpeech/valid_text"
find "${download_dir}/LibriSpeech/test-clean/" -name '*.txt' -exec cat {} \; >> "${download_dir}/LibriSpeech/test-clean/text"
find "${download_dir}/LibriSpeech/test-other/" -name '*.txt' -exec cat {} \; >> "${download_dir}/LibriSpeech/test-other/text"

echo "Dictionary preparation (sentencepiece ${bpemode}, ${nbpe} pieces)"
mkdir -p data/lang_char/
bpemodel=data/lang_char/${train_dir}_${bpemode}${nbpe}
encoded=data/lang_char/${train_dir}_${bpemode}${nbpe}_encoded.txt
fairseq_dict=data/lang_char/${train_dir}_${bpemode}${nbpe}_dict.txt

cut -f 2- -d" " "${download_dir}/LibriSpeech/${train_dir}/text" > data/lang_char/input.txt
spm_train --input=data/lang_char/input.txt --vocab_size=${nbpe} \
    --model_type=${bpemode} --model_prefix=${bpemodel} \
    --input_sentence_size=100000000 --unk_id=3 --eos_id=2 --pad_id=1 \
    --bos_id=-1 --character_coverage=1
spm_encode --model=${bpemodel}.model --output_format=piece \
    < data/lang_char/input.txt > ${encoded}
# word<space>count dictionary in this framework's (fairseq) format
tr ' ' '\n' < ${encoded} | sort | uniq -c | awk '{print $2 " " $1}' > ${fairseq_dict}

echo "Prepare train and test jsons"
for part in ${train_dir} test-other test-clean; do
    python -m fbk_fairseq_st_tpu.scripts.asr_prep_json \
        --audio-dirs "${download_dir}/LibriSpeech/${part}" \
        --labels "${download_dir}/LibriSpeech/${part}/text" \
        --spm-model ${bpemodel}.model --audio-format flac \
        --dictionary ${fairseq_dict} --output "${part}.json"
done
mv ${train_dir}.json train.json

echo "Prepare valid json"
python -m fbk_fairseq_st_tpu.scripts.asr_prep_json \
    --audio-dirs "${download_dir}/LibriSpeech/dev-clean" \
                 "${download_dir}/LibriSpeech/dev-other" \
    --labels "${download_dir}/LibriSpeech/valid_text" \
    --spm-model ${bpemodel}.model --audio-format flac \
    --dictionary ${fairseq_dict} --output valid.json

cp ${fairseq_dict} ./dict.txt
cp ${bpemodel}.model ./spm.model

echo "Done. Train with:"
echo "  python -m fbk_fairseq_st_tpu.cli.train ${out_dir} --task speech_recognition --dataset-from-json ..."
