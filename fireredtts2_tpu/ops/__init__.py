"""Pure-function numerics: masks, mel frontend, DFT/iSTFT, RoPE, sampling,
attention. No classes hold tensors; everything is jit-friendly with static
shapes."""
