"""Model families: the dual-transformer text-speech LM and the RedCodec
speech codec (encoders, RVQ, streaming vocoder)."""
