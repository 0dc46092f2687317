"""CLI entry point: SDXL LoRA-ESD training.

Mirrors `python train_lora_xl.py --config_file <yaml>`
(train_lora_xl.py:397-407 in p1atdev/LECO). Deltas vs the SD path
(train_lora_xl.py:40-386): dual tokenizers/encoders, penultimate-layer
concat embeddings + pooled embeds, add_time_ids micro-conditioning.
"""

import argparse

import jax.numpy as jnp


def main(args):
    from leco_tpu.parallel.distributed import maybe_initialize_distributed
    from leco_tpu.utils.cache import enable_compilation_cache

    from leco_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    maybe_initialize_distributed()
    enable_compilation_cache()
    from leco_tpu.config import load_config_from_yaml, parse_precision
    from leco_tpu.lora import LoRASpec
    from leco_tpu.models.loader import load_models_xl
    from leco_tpu.ops.attention import default_backend
    from leco_tpu.parallel.sharding import make_mesh_2d, shard_unet_params
    from leco_tpu.prompts import PromptEmbedsXL, load_prompts_from_yaml
    from leco_tpu.train.trainer import ModelBundle, train
    from leco_tpu.utils.debug import check_frozen_params, check_trainable_params

    config = load_config_from_yaml(args.config_file)
    prompts = load_prompts_from_yaml(config.prompts_file)

    weight_dtype = parse_precision(config.train.precision)

    spec = LoRASpec(
        rank=config.network.rank,
        alpha=config.network.alpha,
        network_type=config.network.type,
        train_method=config.network.training_method,
    )

    use_flash = config.other.use_flash_attention
    if use_flash is None:
        use_flash = config.other.use_xformers or default_backend() == "flash"
    backend = "flash" if use_flash else "xla"

    models = load_models_xl(
        config.pretrained_model.name_or_path,
        scheduler_name=config.train.noise_scheduler,
        weight_dtype=weight_dtype,
        lora_spec=spec,
        attn_backend=backend,
        remat=config.train.checkpoint_unet,
    )

    tokenizers = [models.tokenizer, models.tokenizer_2]
    encoders = [models.text_encoder, models.text_encoder_2]

    def encode_fn(prompt: str) -> PromptEmbedsXL:
        """encode_prompts_xl (train_util.py:107-130): per encoder take the
        PENULTIMATE hidden state, concat on the feature dim; pooled comes
        from encoder 2 (projected EOS state)."""
        seqs = []
        pooled = None
        for tokenizer, te in zip(tokenizers, encoders):
            tokens = jnp.asarray(tokenizer([prompt]))
            _, pooled, hidden = te.model.apply({"params": te.params}, tokens)
            seqs.append(hidden[-2])
        return PromptEmbedsXL(jnp.concatenate(seqs, axis=-1), pooled)

    bundle = ModelBundle(
        unet=models.unet,
        base_params=models.unet_base_params,
        lora_params=models.unet_lora_params,
        scheduler=models.scheduler,
        spec=spec,
        encode_fn=encode_fn,
        is_xl=True,
    )

    check_trainable_params(bundle.lora_params)
    check_frozen_params(bundle.base_params)

    mesh = None
    if config.train.data_parallel or config.train.tensor_parallel > 1:
        mesh = make_mesh_2d(tp=config.train.tensor_parallel)
        bundle.base_params = shard_unet_params(bundle.base_params, mesh)
    train(config, prompts, bundle, mesh=mesh)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config_file",
        required=True,
        help="Config file for training.",
    )
    args = parser.parse_args()
    main(args)
