#!/usr/bin/env python
"""Main program to use the speech recognizer (thin CLI shim).

See rnn_speech_tpu/cli.py for the mode dispatch; usage mirrors the
reference entry point: --train_acoustic / --train_language / --file /
--record / --evaluate / --generate_text.
"""

import sys

from rnn_speech_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
