"""Model families: acoustic LSTM+CTC, char-level LM, recognizer wrapper."""
