"""Training losses (parity target: /root/reference/GAN2Shape/losses.py).

All pure jnp — XLA fuses the elementwise chains; no module state."""

import jax.numpy as jnp

EPS = 1e-7


def photometric_loss(image1, image2, mask=None, conf_sigma=None):
    """Masked L1 (reference losses.py:39-51)."""
    loss = jnp.abs(image1 - image2)
    if conf_sigma is not None:
        loss = (loss * 2 ** 0.5 / (conf_sigma + EPS)
                + jnp.log(conf_sigma + EPS))
    if mask is not None:
        mask = jnp.broadcast_to(mask, loss.shape)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), EPS)
    return jnp.mean(loss)


def _gradient(pred):
    # (B, H, W) or (B, C, H, W) flattened to rows x cols
    if pred.ndim == 4:
        pred = pred.reshape(-1, pred.shape[2], pred.shape[3])
    d_dy = pred[:, 1:] - pred[:, :-1]
    d_dx = pred[:, :, 1:] - pred[:, :, :-1]
    return d_dx, d_dy


def smooth_loss(pred_map):
    """Second-order smoothness: mean |d2| over dxx, dxy, dyx, dyy, with the
    reference's 1/2.3 multi-scale weighting (losses.py:54-79)."""
    if not isinstance(pred_map, (tuple, list)):
        pred_map = [pred_map]
    loss = 0.0
    weight = 1.0
    for scaled in pred_map:
        dx, dy = _gradient(scaled)
        dx2, dxdy = _gradient(dx)
        dydx, dy2 = _gradient(dy)
        loss = loss + weight * (jnp.mean(jnp.abs(dx2))
                                + jnp.mean(jnp.abs(dxdy))
                                + jnp.mean(jnp.abs(dydx))
                                + jnp.mean(jnp.abs(dy2)))
        weight = weight / 2.3
    return loss


def discriminator_feature_loss(disc_apply, fake_img, real_img, mask=None,
                               ftr_num=4):
    """Feature-matching L1 over the first `ftr_num` discriminator taps,
    with the mask average-pooled to each tap's resolution
    (reference losses.py:6-36).  `disc_apply(x, ftr_num)` -> (_, features);
    gradients flow through fake features only (real pass is stop-gradiented
    by the caller detaching real_img)."""
    import jax

    _, real_feats = disc_apply(real_img, ftr_num)
    real_feats = [jax.lax.stop_gradient(f) for f in real_feats]
    _, fake_feats = disc_apply(fake_img, ftr_num)

    losses = []
    for rf, ff in zip(real_feats, fake_feats):
        diff = jnp.abs(ff - rf)
        if mask is not None:
            b, c, h, w = diff.shape
            hm, wm = mask.shape[2], mask.shape[3]
            sh, sw = hm // h, wm // w
            m = mask.reshape(mask.shape[0], mask.shape[1],
                             h, sh, w, sw).mean(axis=(3, 5))
            m = jnp.broadcast_to(m, diff.shape)
            losses.append(jnp.sum(diff * m) / jnp.maximum(jnp.sum(m), EPS))
        else:
            losses.append(jnp.mean(diff))
    return sum(losses)
