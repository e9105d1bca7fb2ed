#!/usr/bin/python3
"""MuST-SHE gender term-coverage / accuracy evaluation.

Algorithm-identical counterpart of reference scripts/eval/mustshe_acc.py
(COLING 2020 "Breeding Gender-aware Direct Speech Translation Systems"):
per sentence, each annotated gender-marked term pair (correct wrong) is
matched at most once against the tokenized hypothesis; per-category and
global term coverage and gender accuracy are reported.
"""

from __future__ import annotations

import argparse
import csv


def sentence_level_scores(in_f, tsv_f):
    sentences = []
    with open(in_f) as i_f, open(tsv_f) as t_f:
        tsv_reader = csv.DictReader(t_f, delimiter="\t")
        for (i_line, terms_f) in zip(i_f, tsv_reader):
            sentence_correct = 0
            sentence_wrong = 0
            sentence_found = 0
            gender_marked_terms = (
                terms_f["GENDERTERMS"].strip().lower().split(";")
            )
            generated_terms = i_line.strip().lower().split()
            for t in gender_marked_terms:
                term = t.split(" ")
                found = False
                correct_term = term[0]
                wrong_term = term[1]
                try:
                    pos_found = generated_terms.index(correct_term)
                    del generated_terms[pos_found]  # avoid re-matching
                    sentence_correct += 1
                    found = True
                except ValueError:
                    pass
                try:
                    pos_found = generated_terms.index(wrong_term)
                    del generated_terms[pos_found]
                    sentence_wrong += 1
                    found = True
                except ValueError:
                    pass
                if found:
                    sentence_found += 1
            sentences.append(
                {
                    "num_terms": len(gender_marked_terms),
                    "num_terms_found": sentence_found,
                    "num_correct": sentence_correct,
                    "num_wrong": sentence_wrong,
                }
            )
    return sentences


def write_sentence_acc(out_f, sentence_scores):
    with open(out_f, "w") as f_w:
        writer = csv.DictWriter(
            f_w,
            ["num_terms", "num_terms_found", "num_correct", "num_wrong"],
            delimiter="\t",
        )
        writer.writeheader()
        writer.writerows(sentence_scores)


def global_scores(sentence_scores, tsv_f, debug=False):
    i = 0
    category_buffers = {}
    with open(tsv_f, "r") as f:
        reader = csv.DictReader(f, delimiter="\t")
        for line in reader:
            category = line["CATEGORY"]
            if category not in category_buffers:
                category_buffers[category] = {
                    "num_terms": 0, "num_correct": 0,
                    "num_wrong": 0, "num_terms_found": 0,
                }
            for k in ("num_terms", "num_terms_found", "num_correct", "num_wrong"):
                category_buffers[category][k] += sentence_scores[i][k]
            i += 1
    if debug:
        print("Evaluated {} sentences...".format(i))
    overall_scores = {}
    tot_terms = tot_found = tot_correct = tot_wrong = 0
    for c in category_buffers:
        term_cov = (
            float(category_buffers[c]["num_terms_found"])
            / category_buffers[c]["num_terms"]
        )
        if category_buffers[c]["num_terms_found"] > 0:
            gender_acc = float(category_buffers[c]["num_correct"]) / (
                category_buffers[c]["num_correct"]
                + category_buffers[c]["num_wrong"]
            )
        else:
            gender_acc = 0.0
        overall_scores[c] = {
            "term_coverage": term_cov, "gender_accuracy": gender_acc
        }
        tot_terms += category_buffers[c]["num_terms"]
        tot_found += category_buffers[c]["num_terms_found"]
        tot_correct += category_buffers[c]["num_correct"]
        tot_wrong += category_buffers[c]["num_wrong"]
    overall_scores["Global"] = {
        "term_coverage": tot_found / tot_terms,
        "gender_accuracy": tot_correct / max(tot_correct + tot_wrong, 1),
    }
    return overall_scores


def print_scores(out_scores, print_latex=False):
    categories = sorted(out_scores.keys())
    print("Category\tTerm Coverage\tGender Accuracy")
    print("-------------------------------------------------")
    for c in categories:
        if c == "Global":
            print("-------------------------------------------------")
        print(
            "{}\t{}\t{}".format(
                c, out_scores[c]["term_coverage"], out_scores[c]["gender_accuracy"]
            )
        )
        if c == "Global":
            print("-------------------------------------------------")


def cli_main(input_args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, type=str, metavar="FILE",
                        help="Input file to be used to compute accuracies "
                        "(it must be tokenized).")
    parser.add_argument("--tsv-definition", required=True, type=str, metavar="FILE",
                        help="TSV MuST-SHE definitions file.")
    parser.add_argument("--sentence-acc", type=str, default=None, metavar="FILE",
                        help="If set, sentence-level accuracies are written "
                        "to this file.")
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(input_args)

    sentence_scores = sentence_level_scores(args.input, args.tsv_definition)
    if args.sentence_acc is not None:
        write_sentence_acc(args.sentence_acc, sentence_scores)
    scores = global_scores(sentence_scores, args.tsv_definition, args.debug)
    print_scores(scores)
    return scores


if __name__ == "__main__":
    cli_main()
