"""rnn_speech_tpu — a TPU-native speech-recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``domerin0/rnn-speech`` reference (character-level LSTM+CTC speech
recognition, per Hwang & Sung arXiv:1601.06581 with char-map improvements
from arXiv:1609.05935): audio frontends (MFCC / log-mel-fbank+deltas),
stacked-LSTM acoustic model, CTC loss + greedy/beam decoding, char-level
language model, corpus readers for four dataset formats, training with
cross-step gradient accumulation and plateau LR decay, checkpointing, and
data-parallel execution over a TPU mesh.

Nothing here is a port: the compute path is functional JAX (explicit
param/state pytrees, ``lax.scan`` recurrences, Pallas kernels, ``jit`` over
``jax.sharding.Mesh``), and the host runtime (audio decode) is native C++.
"""

__version__ = "0.1.0"

from rnn_speech_tpu.charmap import ENGLISH_CHAR_MAP, CharMap  # noqa: F401
