#!/bin/bash
# Compound-split BLEU over a generate-CLI output (reference
# scripts/compound_split_bleu.sh): hyphenated compounds are split with the
# ##AT##-##AT## sentinel in both hypothesis and reference before scoring
# with the framework's score CLI.

if [ $# -ne 1 ]; then
    echo "usage: $0 GENERATE_OUTPUT"
    exit 1
fi

GEN=$1
SYS=$GEN.sys
REF=$GEN.ref

if [ "$(tail -n 1 "$GEN" | grep -c BLEU)" -ne 1 ]; then
    echo "not done generating"
    exit
fi

grep ^H "$GEN" | awk -F '\t' '{print $NF}' | perl -ple 's{(\S)-(\S)}{$1 ##AT##-##AT## $2}g' > "$SYS"
grep ^T "$GEN" | cut -f2- | perl -ple 's{(\S)-(\S)}{$1 ##AT##-##AT## $2}g' > "$REF"
python -m fbk_fairseq_st_tpu.cli.score --sys "$SYS" --ref "$REF"
