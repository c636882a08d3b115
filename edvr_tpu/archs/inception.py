"""FID InceptionV3 (pool3) feature extractor (flax, NHWC).

Port of the FID-patched torchvision InceptionV3 used by the reference
(reference: basicsr/models/archs/inception.py:17-323, itself from
mseitzer/pytorch-fid): BasicConv2d = conv(no bias) + BN(eps=1e-3) +
relu; the FID patches replace the pool branches' average pooling with
count_include_pad=False and Mixed_7c's pool branch with max pooling.
Module names mirror the torch checkpoint ('Mixed_5b.branch1x1.conv')
so pt_inception weights convert directly via convert_state_dict.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=(self.padding if isinstance(
                        self.padding[0], tuple) else tuple(
                            (p, p) for p in self.padding)),
                    use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name='bn')(x)
        return nn.relu(x)


def _avg_pool_nopad_count(x, window=3, stride=1, padding=1):
    """avg_pool(3x3, count_include_pad=False) — the FID patch."""
    import jax.lax as lax
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    pads = ((padding, padding), (padding, padding))
    summed = lax.reduce_window(x, 0., lax.add,
                               (1, window, window, 1),
                               (1, stride, stride, 1),
                               ((0, 0),) + pads + ((0, 0),))
    counts = lax.reduce_window(ones, 0., lax.add,
                               (1, window, window, 1),
                               (1, stride, stride, 1),
                               ((0, 0),) + pads + ((0, 0),))
    return summed / counts


def _max_pool(x, window=3, stride=2, padding=0):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((padding, padding), (padding, padding)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name='branch3x3dbl_3')(b3)
        bp = _avg_pool_nopad_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name='branch3x3dbl_3')(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name='branch7x7dbl_5')(bd)
        bp = _avg_pool_nopad_count(x)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name='branch7x7x3_4')(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = 'avg'  # 'avg' (Mixed_7b) or 'max' (Mixed_7c, FID)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), name='branch3x3_1')(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name='branch3x3_2a')(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1),
                         name='branch3x3dbl_2')(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name='branch3x3dbl_3a')(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == 'max':
            bp = _max_pool(x, 3, 1, 1)
        else:
            bp = _avg_pool_nopad_count(x)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """pool3 feature network: (n, 299, 299, 3) [0,1] RGB -> (n, 2048)."""
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.normalize_input:
            x = 2 * x - 1
        x = BasicConv2d(32, (3, 3), stride=2, name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1),
                        name='Conv2d_2b_3x3')(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), name='Conv2d_4a_3x3')(x)
        x = _max_pool(x)
        x = InceptionA(32, name='Mixed_5b')(x)
        x = InceptionA(64, name='Mixed_5c')(x)
        x = InceptionA(64, name='Mixed_5d')(x)
        x = InceptionB(name='Mixed_6a')(x)
        x = InceptionC(128, name='Mixed_6b')(x)
        x = InceptionC(160, name='Mixed_6c')(x)
        x = InceptionC(160, name='Mixed_6d')(x)
        x = InceptionC(192, name='Mixed_6e')(x)
        x = InceptionD(name='Mixed_7a')(x)
        x = InceptionE('avg', name='Mixed_7b')(x)
        x = InceptionE('max', name='Mixed_7c')(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (n, 2048)


def build_fid_inception(weights_path: str | None = None):
    """Return (apply_fn, variables); converts pt_inception-2015-12-05
    weights when a path is given."""
    import jax

    net = FIDInceptionV3()
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 299, 299, 3)))
    if weights_path:
        from edvr_tpu.convert import convert_state_dict, load_torch_weights
        state = load_torch_weights(weights_path, param_key=None)
        state = {k: v for k, v in state.items()
                 if not k.startswith(('fc.', 'AuxLogits'))}
        variables, unmatched = convert_state_dict(state, dict(variables))
        if unmatched:
            raise ValueError(f'unconverted inception keys: {unmatched}')

    def apply_fn(x):
        return net.apply(variables, jnp.asarray(x))

    return apply_fn, variables
