"""DFDNet: deep face dictionary network (flax, NHWC)
(reference: basicsr/models/archs/dfdnet_arch.py).

Inference-only (512x512 faces, batch 1, like the reference). The
dictionary feature swap involves data-dependent crops, argmax dictionary
selection and variable-size resizes, so the model is applied *eagerly*
(un-jitted) with concrete part locations; the conv trunk still runs on
the TPU through XLA's eager dispatch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from edvr_tpu.archs.arch_util import Conv2d, lrelu
from edvr_tpu.archs.dfdnet_util import (AttentionBlock, MSDilationBlock,
                                        UpResBlock,
                                        adaptive_instance_normalization,
                                        blur)
from edvr_tpu.archs.vgg_arch import VGGFeatureExtractor
from edvr_tpu.ops.resize import interpolate
from edvr_tpu.utils.registry import ARCH_REGISTRY


class SFTUpBlock(nn.Module):
    """Spatial feature transform + upsample
    (reference: dfdnet_arch.py:13-54)."""
    in_channel: int
    out_channel: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, updated_feat):
        out = blur(x)
        out = Conv2d(self.out_channel, self.kernel_size,
                     padding=self.padding, name='conv1_1')(out)
        # the official code stacks two LeakyReLUs -> slope 0.04
        out = lrelu(out, 0.04)

        scale = Conv2d(self.out_channel, 3, padding=1,
                       name='scale_block_0')(updated_feat)
        scale = lrelu(scale, 0.2)
        scale = Conv2d(self.out_channel, 3, padding=1,
                       name='scale_block_2')(scale)
        shift = Conv2d(self.out_channel, 3, padding=1,
                       name='shift_block_0')(updated_feat)
        shift = lrelu(shift, 0.2)
        shift = Conv2d(self.out_channel, 3, padding=1,
                       name='shift_block_2')(shift)
        shift = nn.sigmoid(shift)
        out = out * scale + shift

        out = interpolate(out, scale_factor=2, mode='bilinear',
                          align_corners=False)
        out = Conv2d(self.out_channel, self.kernel_size,
                     padding=self.padding, name='convup_1')(out)
        return lrelu(out, 0.2)


@ARCH_REGISTRY.register()
class DFDNet(nn.Module):
    """(reference: dfdnet_arch.py:57-180). Apply eagerly with
    ``net.apply(vars, x, part_locations, dict_feat)`` where dict_feat is
    the converted part dictionary {f'{size}': {part: (k, h, w, c)}} and
    part_locations is a list of 4 integer numpy arrays (x0,y0,x1,y1)."""
    num_feat: int
    parts: tuple = ('left_eye', 'right_eye', 'nose', 'mouth')
    feature_sizes: tuple = (256, 128, 64, 32)
    channel_sizes: tuple = (128, 256, 512, 512)
    vgg_layers: tuple = ('relu2_2', 'relu3_4', 'relu4_4', 'conv5_4')

    def setup(self):
        self.vgg_extractor = VGGFeatureExtractor(
            layer_name_list=self.vgg_layers, vgg_type='vgg19',
            use_input_norm=True, range_norm=True)
        attn = {}
        for idx, f_size in enumerate(self.feature_sizes):
            for name in self.parts:
                attn[f'{name}_{f_size}'] = AttentionBlock(
                    self.channel_sizes[idx],
                    name=f'attn_blocks_{name}_{f_size}')
        self._attn = attn
        self.multi_scale_dilation = MSDilationBlock(
            self.num_feat * 8, dilation=(4, 3, 2, 1))
        self.upsample0 = SFTUpBlock(self.num_feat * 8, self.num_feat * 8)
        self.upsample1 = SFTUpBlock(self.num_feat * 8, self.num_feat * 4)
        self.upsample2 = SFTUpBlock(self.num_feat * 4, self.num_feat * 2)
        self.upsample3 = SFTUpBlock(self.num_feat * 2, self.num_feat)
        self.up4_conv0 = Conv2d(self.num_feat, 3, padding=1, name='upsample4_0')
        self.up4_res2 = UpResBlock(self.num_feat, name='upsample4_2')
        self.up4_res3 = UpResBlock(self.num_feat, name='upsample4_3')
        self.up4_conv4 = Conv2d(3, 3, padding=1, name='upsample4_4')

    def swap_feat(self, vgg_feat, updated_feat, dict_feat, location,
                  part_name, f_size):
        """Dictionary feature swap (reference: dfdnet_arch.py:104-131).
        location: concrete ints (x0, y0, x1, y1)."""
        x0, y0, x1, y1 = [int(v) for v in location]
        part_feat = vgg_feat[:, y0:y1, x0:x1, :]
        part_resize_feat = interpolate(
            part_feat, size=dict_feat.shape[1:3], mode='bilinear')
        dict_feat = adaptive_instance_normalization(dict_feat,
                                                    part_resize_feat)
        # per-dict-entry correlation: conv of the part with each entry as
        # kernel == full dot products (entries match the resize size)
        sim = jnp.einsum('nhwc,khwc->nk', part_resize_feat, dict_feat)
        sim = jax.nn.softmax(sim.reshape(-1))
        select_idx = int(jnp.argmax(sim))
        swap = interpolate(dict_feat[select_idx:select_idx + 1],
                           size=part_feat.shape[1:3], mode='nearest')
        attn = self._attn[f'{part_name}_{f_size}'](swap - part_feat)
        attn_feat = attn * swap
        return updated_feat.at[:, y0:y1, x0:x1, :].set(attn_feat + part_feat)

    def __call__(self, x, part_locations, dict_feat):
        vgg_features = self.vgg_extractor(x)
        updated_vgg_features = []
        batch = 0  # inference with batch size 1, like the reference
        for vgg_layer, f_size in zip(self.vgg_layers, self.feature_sizes):
            dict_features = dict_feat[f'{f_size}']
            vgg_feat = vgg_features[vgg_layer]
            updated_feat = vgg_feat
            for part_idx, part_name in enumerate(self.parts):
                location = np.asarray(
                    part_locations[part_idx][batch]) // (512 // f_size)
                updated_feat = self.swap_feat(vgg_feat, updated_feat,
                                              dict_features[part_name],
                                              location, part_name, f_size)
            updated_vgg_features.append(updated_feat)

        feat = self.multi_scale_dilation(vgg_features['conv5_4'])
        feat = self.upsample0(feat, updated_vgg_features[3])
        feat = self.upsample1(feat, updated_vgg_features[2])
        feat = self.upsample2(feat, updated_vgg_features[1])
        feat = self.upsample3(feat, updated_vgg_features[0])
        feat = lrelu(self.up4_conv0(feat), 0.2)
        feat = self.up4_res3(self.up4_res2(feat))
        return jnp.tanh(self.up4_conv4(feat))
