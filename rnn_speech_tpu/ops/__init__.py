"""Device-side compute primitives: frontend DSP, LSTM, CTC, decoding."""
