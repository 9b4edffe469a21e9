from gangealing_tpu.models.stylegan2 import (
    GeneratorConfig, generator_init, generator_apply, mapping, batch_latent,
    mean_latent)
from gangealing_tpu.models.stn import (
    STNConfig, ComposedSTNConfig, stn_init, stn_forward, composed_stn_init,
    composed_stn_forward, composed_transfer_points, composed_congeal_points,
    composed_uncongeal_points, composed_forward_with_flip,
    composed_match_flows, composed_propagate_object)
from gangealing_tpu.models.latent_learner import (
    LatentLearnerConfig, latent_learner_init, latent_learner_interpolate, PCA)
from gangealing_tpu.models.lpips import (
    PerceptualLossConfig, make_perceptual_loss, lpips_distance, vgg16_init,
    vgg16_features, import_torchvision_vgg)
from gangealing_tpu.models.classifier import (
    ClassifierConfig, classifier_init, classifier_forward)


def get_stn_config(transforms, **kwargs) -> ComposedSTNConfig:
    """Factory mirroring the reference's get_stn
    (spatial_transformer.py:11-20): accepts a transform string or list."""
    if isinstance(transforms, str):
        transforms = [transforms]
    return ComposedSTNConfig(transforms=tuple(transforms), **kwargs)


def batched_forward(fn, inputs, batch_size, *args, **kwargs):
    """Apply ``fn`` to ``inputs`` in chunks along the leading axis and
    concatenate (reference models/__init__.py:27-33's memory-saving helper).
    ``fn(chunk, *args, **kwargs)`` must return an array or tuple of arrays."""
    import numpy as np

    outs = []
    n = inputs.shape[0]
    for s in range(0, n, batch_size):
        outs.append(fn(inputs[s:s + batch_size], *args, **kwargs))
    if isinstance(outs[0], (tuple, list)):
        return tuple(np.concatenate([np.asarray(o[i]) for o in outs])
                     for i in range(len(outs[0])))
    return np.concatenate([np.asarray(o) for o in outs])
