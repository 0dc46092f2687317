"""Memory-hygiene utility (reference: flush.py — `torch.cuda.empty_cache()`
+ `gc.collect()`).

On TPU/XLA there is no allocator cache to flush per iteration — the jitted
train step reuses donated buffers and XLA owns device memory — so the
per-iteration flush the reference performs (train_lora.py:29-31,290) has no
equivalent and is unnecessary. What CAN be released from a live process:
jit caches and host-side references. That is what this does."""

import gc

import jax


def flush() -> None:
    jax.clear_caches()
    gc.collect()


if __name__ == "__main__":
    flush()
