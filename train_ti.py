"""CLI entry point: textual-inversion-style concept erasure (leco-tpu
extension; no reference counterpart — the reference only trains LoRAs).

Same one-flag surface and YAML schema as train_lora.py; the trainable is
the target prompt's token embeddings instead of a LoRA, exported as an
A1111 textual-inversion .safetensors (see
leco_tpu/train/textual_inversion.py).
"""

import argparse


def main(args):
    from leco_tpu.utils.cache import enable_compilation_cache

    from leco_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compilation_cache()
    import jax.numpy as jnp

    from leco_tpu.config import load_config_from_yaml, parse_precision
    from leco_tpu.lora import LoRASpec
    from leco_tpu.models.loader import load_models
    from leco_tpu.ops.attention import default_backend
    from leco_tpu.prompts import load_prompts_from_yaml
    from leco_tpu.train.textual_inversion import (
        TextEncoderHandle,
        train_textual_inversion,
    )
    from leco_tpu.train.trainer import ModelBundle

    config = load_config_from_yaml(args.config_file)
    prompts = load_prompts_from_yaml(config.prompts_file)
    weight_dtype = parse_precision(config.train.precision)

    models = load_models(
        config.pretrained_model.name_or_path,
        scheduler_name=config.train.noise_scheduler,
        v2=config.pretrained_model.v2,
        v_pred=config.pretrained_model.v_pred,
        weight_dtype=weight_dtype,
        clip_skip=config.pretrained_model.clip_skip,
        lora_spec=LoRASpec(rank=config.network.rank),
        attn_backend="flash" if default_backend() == "flash" else "xla",
        remat=config.train.checkpoint_unet,
    )
    te = models.text_encoder

    def encode_fn(prompt: str):
        tokens = jnp.asarray(models.tokenizer([prompt]))
        last, _, _ = te.model.apply({"params": te.params}, tokens)
        return last

    bundle = ModelBundle(
        unet=models.unet,
        base_params=models.unet_base_params,
        lora_params=models.unet_lora_params,
        scheduler=models.scheduler,
        spec=LoRASpec(rank=config.network.rank),
        encode_fn=encode_fn,
        is_xl=False,
    )
    handle = TextEncoderHandle(
        model=te.model, params=te.params, tokenizer=models.tokenizer
    )
    result = train_textual_inversion(config, prompts, bundle, handle)
    print(f"saved: {[str(p) for p in result['saved']]}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config_file", required=True, help="Config file for training."
    )
    main(parser.parse_args())
