"""Host-side utilities: audio/image IO, timing, tokenizer."""
