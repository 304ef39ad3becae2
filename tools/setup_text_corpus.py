#!/usr/bin/env python
"""Build a language-model text corpus file (one sentence per line).

Counterpart of the reference's util/setuptextcorpus.py stub (which fetched
the nltk reuters corpus and was never wired further).  Sources, in priority
order:

  1. ``--nltk-reuters``: the nltk reuters corpus, if nltk + its data are
     installed (matches the reference's intent; unavailable offline).
  2. ``--from-datasets DIR [DIR...]``: transcript labels extracted from any
     supported acoustic corpus layout (LibriSpeech / Shtooka / Vystadial /
     TEDLIUM), cleaned with the label codec's ``clean_label``.
  3. ``--from-text FILE [FILE...]``: plain text files, split per line.

The output feeds ``[lm_network_params] text_corpus`` in config.ini, which
``stt.py --train_language`` reads.

Usage:
  python tools/setup_text_corpus.py --from-datasets data/LibriSpeech \
      --output data/lm_corpus.txt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def texts_from_nltk_reuters():
    try:
        from nltk.corpus import reuters  # type: ignore
    except ImportError:
        raise SystemExit("nltk not installed, use 'pip install nltk'")
    return [" ".join(reuters.words(fid)) for fid in reuters.fileids()]


def texts_from_datasets(dirs):
    from rnn_speech_tpu import corpus

    dp = corpus.DataProcessor(", ".join(dirs))
    return [label for _, label, _ in dp.get_dataset()]


def texts_from_files(files):
    out = []
    for path in files:
        with open(path) as fh:
            out.extend(line.strip() for line in fh if line.strip())
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", required=True, help="corpus file to write")
    parser.add_argument("--nltk-reuters", action="store_true",
                        help="use the nltk reuters corpus")
    parser.add_argument("--from-datasets", nargs="+", default=None,
                        metavar="DIR", help="acoustic corpus directories")
    parser.add_argument("--from-text", nargs="+", default=None,
                        metavar="FILE", help="plain text files")
    parser.add_argument("--min-chars", type=int, default=4,
                        help="drop lines shorter than this many characters")
    args = parser.parse_args(argv)

    from rnn_speech_tpu.charmap import clean_label

    if args.nltk_reuters:
        texts = texts_from_nltk_reuters()
    elif args.from_datasets:
        texts = texts_from_datasets(args.from_datasets)
    elif args.from_text:
        texts = texts_from_files(args.from_text)
    else:
        parser.error("pick a source: --nltk-reuters / --from-datasets / --from-text")

    kept = 0
    with open(args.output, "w") as fh:
        for text in texts:
            cleaned = clean_label(text).strip()
            if len(cleaned) >= args.min_chars:
                fh.write(cleaned + "\n")
                kept += 1
    print(f"Wrote {kept} sentences to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
