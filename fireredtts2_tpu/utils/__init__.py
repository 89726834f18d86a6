"""Host-side utilities: text cleaning/splitting, tokenization, audio I/O."""
