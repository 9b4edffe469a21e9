from gangealing_tpu.models.stylegan2 import (
    GeneratorConfig, generator_init, generator_apply, mapping, batch_latent,
    mean_latent)
