"""Unsupervised energy masks (optional beamformer front-ends).

Rebuilds the capability of pb_bss.extraction.mask_module.lorenz_mask /
quantile_mask as used by the optional entry points
``beamform_mvdr_souden_with_lorenz_mask`` /
``..._with_quantil_mask`` (reference wrapper:211-251).  Semantics
(re-derived from the published pb_bss behaviour):

* ``lorenz_mask``: along ``axis``, the bins that together carry the top
  ``lorenz_fraction`` of the total power are "speech"; the mask is a soft
  {weight, 1 - weight} assignment.
* ``quantile_mask(q)``: for q >= 0 the loudest ``q`` fraction of bins along
  ``axis``; for q < 0 the quietest ``|q|`` fraction.  A list of quantiles
  returns a tuple of masks (the wrapper uses ``[0.1, -0.8]`` for
  speech/noise).
"""

import jax.numpy as jnp

__all__ = ['lorenz_mask', 'quantile_mask']


def lorenz_mask(observation, *, axis=-1, lorenz_fraction=0.98, weight=0.999):
    power = jnp.abs(jnp.asarray(observation)) ** 2
    power = jnp.moveaxis(power, axis, -1)
    sorted_power = jnp.sort(power, axis=-1)[..., ::-1]
    total = jnp.maximum(jnp.sum(sorted_power, axis=-1, keepdims=True),
                        jnp.finfo(power.dtype).tiny)
    cum = jnp.cumsum(sorted_power, axis=-1) / total
    # Last sorted index still inside the lorenz fraction defines the
    # power threshold.
    inside = cum < lorenz_fraction
    threshold = jnp.min(
        jnp.where(inside, sorted_power, sorted_power[..., :1]), axis=-1,
        keepdims=True)
    mask = jnp.where(power >= threshold, weight, 1.0 - weight)
    return jnp.moveaxis(mask.astype(power.dtype), -1, axis)


def quantile_mask(observation, quantile=0.9, *, sensor_axis=None, axis=-1,
                  weight=0.999):
    if isinstance(quantile, (tuple, list)):
        return tuple(
            quantile_mask(observation, q, sensor_axis=sensor_axis,
                          axis=axis, weight=weight)
            for q in quantile
        )
    power = jnp.abs(jnp.asarray(observation))
    if sensor_axis is not None:
        power = power.sum(axis=sensor_axis, keepdims=True)
    if quantile >= 0:
        threshold = jnp.quantile(power, 1.0 - quantile, axis=axis,
                                 keepdims=True)
        mask = power >= threshold
    else:
        threshold = jnp.quantile(power, -quantile, axis=axis, keepdims=True)
        mask = power <= threshold
    mask = jnp.where(mask, weight, 1.0 - weight).astype(power.dtype)
    if sensor_axis is not None:
        mask = jnp.squeeze(mask, axis=sensor_axis)
    return mask
