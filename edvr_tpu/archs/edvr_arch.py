"""EDVR: video restoration with PCD deformable alignment + TSA fusion
(flax, NHWC, TPU-first).

Structure parity with the reference
(reference: basicsr/models/archs/edvr_arch.py): PCDAlignment
(:9-117) — 3-level pyramid with per-level offset convs + DCNv2 and a
cascading DCN, offsets upsampled x2 with magnitude doubling (:106-110);
TSAFusion (:120-214) — temporal correlation sigmoid weights + 2-level
spatial attention pyramid, final ``feat*attn*2 + attn_add``;
PredeblurModule (:217-269); EDVR top (:272-420).

TPU-first differences from the reference's execution plan:
* the per-frame Python loop over PCD (edvr_arch.py:397-403) becomes
  ``nn.vmap`` over the frame axis — one traced PCD, batched execution;
* frames fold into the batch dim for feature extraction exactly like
  the reference (edvr_arch.py:376) but stay folded as one big conv
  batch for the MXU;
* all convs NHWC with explicit torch-style padding.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from edvr_tpu.archs.arch_util import (Conv2d, DCNv2Pack, ResidualBlockNoBN,
                                      lrelu, make_layer)
from edvr_tpu.ops.resize import interpolate, pixel_shuffle
from edvr_tpu.utils.registry import ARCH_REGISTRY


class PCDAlignment(nn.Module):
    """Pyramid, Cascading and Deformable alignment
    (reference: edvr_arch.py:9-117)."""
    num_feat: int = 64
    deformable_groups: int = 8

    @nn.compact
    def __call__(self, nbr_feat_l, ref_feat_l):
        """nbr_feat_l/ref_feat_l: tuples of 3 NHWC arrays (L1, L2, L3)."""
        nf = self.num_feat
        upsampled_offset, upsampled_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            level = f'l{i}'
            offset = jnp.concatenate([nbr_feat_l[i - 1], ref_feat_l[i - 1]],
                                     axis=-1)
            offset = lrelu(Conv2d(nf, 3, padding=1,
                                  name=f'offset_conv1_{level}')(offset))
            if i == 3:
                offset = lrelu(Conv2d(nf, 3, padding=1,
                                      name=f'offset_conv2_{level}')(offset))
            else:
                offset = lrelu(Conv2d(nf, 3, padding=1,
                                      name=f'offset_conv2_{level}')(
                    jnp.concatenate([offset, upsampled_offset], axis=-1)))
                offset = lrelu(Conv2d(nf, 3, padding=1,
                                      name=f'offset_conv3_{level}')(offset))

            feat = DCNv2Pack(nf, 3, padding=1,
                             deformable_groups=self.deformable_groups,
                             name=f'dcn_pack_{level}')(nbr_feat_l[i - 1],
                                                       offset)
            if i < 3:
                feat = Conv2d(nf, 3, padding=1, name=f'feat_conv_{level}')(
                    jnp.concatenate([feat, upsampled_feat], axis=-1))
            if i > 1:
                feat = lrelu(feat)
                # upsample offset x2 and double magnitude (:106-110)
                upsampled_offset = interpolate(
                    offset, scale_factor=2, mode='bilinear',
                    align_corners=False) * 2
                upsampled_feat = interpolate(
                    feat, scale_factor=2, mode='bilinear',
                    align_corners=False)

        # cascading refinement (:112-117)
        offset = jnp.concatenate([feat, ref_feat_l[0]], axis=-1)
        offset = lrelu(Conv2d(nf, 3, padding=1,
                              name='cas_offset_conv1')(offset))
        offset = lrelu(Conv2d(nf, 3, padding=1,
                              name='cas_offset_conv2')(offset))
        feat = lrelu(DCNv2Pack(nf, 3, padding=1,
                               deformable_groups=self.deformable_groups,
                               name='cas_dcnpack')(feat, offset))
        return feat


class TSAFusion(nn.Module):
    """Temporal-Spatial Attention fusion (reference: edvr_arch.py:120-214).

    Input: (b, t, h, w, c) aligned features. Output: (b, h, w, c).
    """
    num_feat: int = 64
    num_frame: int = 5
    center_frame_idx: int = 2

    @nn.compact
    def __call__(self, aligned_feat):
        b, t, h, w, c = aligned_feat.shape
        nf = self.num_feat
        # temporal attention: per-pixel correlation with the center frame
        emb_ref = Conv2d(nf, 3, padding=1, name='temporal_attn1')(
            aligned_feat[:, self.center_frame_idx])
        emb = Conv2d(nf, 3, padding=1, name='temporal_attn2')(
            aligned_feat.reshape(b * t, h, w, c)).reshape(b, t, h, w, -1)
        corr = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (b, t, h, w)
        corr_prob = nn.sigmoid(corr)[..., None]  # (b, t, h, w, 1)
        # frame-major channel stacking matches the reference's
        # view(b, t*c, h, w) ordering (:183-184)
        weighted = (aligned_feat * corr_prob).transpose(0, 2, 3, 1, 4)
        weighted = weighted.reshape(b, h, w, t * c)

        feat = lrelu(Conv2d(nf, 1, padding=0, name='feat_fusion')(weighted))

        # spatial attention pyramid (:189-213)
        pool_max = lambda v: nn.max_pool(v, (3, 3), strides=(2, 2),
                                         padding=((1, 1), (1, 1)))
        pool_avg = lambda v: nn.avg_pool(v, (3, 3), strides=(2, 2),
                                         padding=((1, 1), (1, 1)),
                                         count_include_pad=True)
        attn = lrelu(Conv2d(nf, 1, padding=0, name='spatial_attn1')(weighted))
        attn_max = pool_max(attn)
        attn_avg = pool_avg(attn)
        attn = lrelu(Conv2d(nf, 1, padding=0, name='spatial_attn2')(
            jnp.concatenate([attn_max, attn_avg], axis=-1)))
        # pyramid level
        attn_level = lrelu(Conv2d(nf, 1, padding=0,
                                  name='spatial_attn_l1')(attn))
        attn_max = pool_max(attn_level)
        attn_avg = pool_avg(attn_level)
        attn_level = lrelu(Conv2d(nf, 3, padding=1, name='spatial_attn_l2')(
            jnp.concatenate([attn_max, attn_avg], axis=-1)))
        attn_level = lrelu(Conv2d(nf, 3, padding=1,
                                  name='spatial_attn_l3')(attn_level))
        attn_level = interpolate(attn_level, scale_factor=2, mode='bilinear',
                                 align_corners=False)

        attn = lrelu(Conv2d(nf, 3, padding=1,
                            name='spatial_attn3')(attn)) + attn_level
        attn = lrelu(Conv2d(nf, 1, padding=0, name='spatial_attn4')(attn))
        attn = interpolate(attn, scale_factor=2, mode='bilinear',
                           align_corners=False)
        attn = Conv2d(nf, 3, padding=1, name='spatial_attn5')(attn)
        attn_add = Conv2d(nf, 1, padding=0, name='spatial_attn_add2')(
            lrelu(Conv2d(nf, 1, padding=0, name='spatial_attn_add1')(attn)))
        attn = nn.sigmoid(attn)

        # after init, attn*2 ~= 1 (:212-213)
        return feat * attn * 2 + attn_add


class PredeblurModule(nn.Module):
    """Pre-deblur pyramid (reference: edvr_arch.py:217-269)."""
    num_feat: int = 64
    hr_in: bool = False

    @nn.compact
    def __call__(self, x):
        nf = self.num_feat
        feat_l1 = lrelu(Conv2d(nf, 3, padding=1, name='conv_first')(x))
        if self.hr_in:
            feat_l1 = lrelu(Conv2d(nf, 3, stride=2, padding=1,
                                   name='stride_conv_hr1')(feat_l1))
            feat_l1 = lrelu(Conv2d(nf, 3, stride=2, padding=1,
                                   name='stride_conv_hr2')(feat_l1))

        feat_l2 = lrelu(Conv2d(nf, 3, stride=2, padding=1,
                               name='stride_conv_l2')(feat_l1))
        feat_l3 = lrelu(Conv2d(nf, 3, stride=2, padding=1,
                               name='stride_conv_l3')(feat_l2))

        feat_l3 = interpolate(
            ResidualBlockNoBN(num_feat=nf, name='resblock_l3')(feat_l3),
            scale_factor=2, mode='bilinear', align_corners=False)
        feat_l2 = ResidualBlockNoBN(num_feat=nf,
                                    name='resblock_l2_1')(feat_l2) + feat_l3
        feat_l2 = interpolate(
            ResidualBlockNoBN(num_feat=nf, name='resblock_l2_2')(feat_l2),
            scale_factor=2, mode='bilinear', align_corners=False)

        for i in range(2):
            feat_l1 = ResidualBlockNoBN(num_feat=nf,
                                        name=f'resblock_l1_{i}')(feat_l1)
        feat_l1 = feat_l1 + feat_l2
        for i in range(2, 5):
            feat_l1 = ResidualBlockNoBN(num_feat=nf,
                                        name=f'resblock_l1_{i}')(feat_l1)
        return feat_l1


@ARCH_REGISTRY.register()
class EDVR(nn.Module):
    """EDVR top-level network (reference: edvr_arch.py:272-420).

    Input: (b, t, h, w, c) LQ frames; output: (b, 4h, 4w, c) (x4 only,
    like the reference).
    """
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_frame: int = 5
    deformable_groups: int = 8
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    center_frame_idx: int | None = 2
    hr_in: bool = False
    with_predeblur: bool = False
    with_tsa: bool = True
    # rematerialize residual trunks in the backward pass — trades FLOPs
    # for activation memory on the large (128ch/40-block) variants
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        center = (self.num_frame // 2 if self.center_frame_idx is None else
                  self.center_frame_idx)
        b, t, h, w, c = x.shape
        if self.hr_in:
            assert h % 16 == 0 and w % 16 == 0, (
                'The height and width must be multiple of 16.')
        else:
            assert h % 4 == 0 and w % 4 == 0, (
                'The height and width must be multiple of 4.')

        x_center = x[:, center]
        nf = self.num_feat

        # per-frame feature extraction with frames folded into batch
        # (reference: edvr_arch.py:371-384)
        xf = x.reshape(b * t, h, w, c)
        if self.with_predeblur:
            feat_l1 = PredeblurModule(num_feat=nf, hr_in=self.hr_in,
                                      name='predeblur')(xf)
            feat_l1 = Conv2d(nf, 1, padding=0, name='conv_1x1')(feat_l1)
            if self.hr_in:
                h, w = h // 4, w // 4
        else:
            feat_l1 = lrelu(Conv2d(nf, 3, padding=1, name='conv_first')(xf))

        block_cls = nn.remat(ResidualBlockNoBN) if self.remat else \
            ResidualBlockNoBN
        feat_l1 = make_layer(block_cls, self.num_extract_block,
                             name='feature_extraction', num_feat=nf)(feat_l1)
        feat_l2 = lrelu(Conv2d(nf, 3, stride=2, padding=1,
                               name='conv_l2_1')(feat_l1))
        feat_l2 = lrelu(Conv2d(nf, 3, padding=1, name='conv_l2_2')(feat_l2))
        feat_l3 = lrelu(Conv2d(nf, 3, stride=2, padding=1,
                               name='conv_l3_1')(feat_l2))
        feat_l3 = lrelu(Conv2d(nf, 3, padding=1, name='conv_l3_2')(feat_l3))

        feat_l1 = feat_l1.reshape(b, t, h, w, nf)
        feat_l2 = feat_l2.reshape(b, t, h // 2, w // 2, nf)
        feat_l3 = feat_l3.reshape(b, t, h // 4, w // 4, nf)

        ref_feat_l = (feat_l1[:, center], feat_l2[:, center],
                      feat_l3[:, center])
        nbr_feat_l = (feat_l1, feat_l2, feat_l3)

        # one PCD alignment with frames folded into the batch dim and the
        # reference pyramid tiled across frames — replaces the
        # reference's per-frame Python loop (edvr_arch.py:397-403) with a
        # single big-batch trace (better XLA/MXU utilization than a
        # vmapped per-frame body, and keeps the DCN gathers in their
        # fast non-batched form)
        nbr_flat = tuple(
            f.reshape(b * t, *f.shape[2:]) for f in nbr_feat_l)
        ref_flat = tuple(
            jnp.repeat(f[:, None], t, axis=1).reshape(b * t, *f.shape[1:])
            for f in ref_feat_l)
        pcd = PCDAlignment(num_feat=nf,
                           deformable_groups=self.deformable_groups,
                           name='pcd_align')
        aligned_feat = pcd(nbr_flat, ref_flat).reshape(b, t, h, w, nf)

        if self.with_tsa:
            feat = TSAFusion(num_feat=nf, num_frame=self.num_frame,
                             center_frame_idx=center,
                             name='fusion')(aligned_feat)
        else:
            # frame-major channel stacking (reference: edvr_arch.py:406)
            flat = aligned_feat.transpose(0, 2, 3, 1, 4).reshape(
                b, h, w, t * nf)
            feat = Conv2d(nf, 1, padding=0, name='fusion')(flat)

        out = make_layer(block_cls, self.num_reconstruct_block,
                         name='reconstruction', num_feat=nf)(feat)
        out = lrelu(pixel_shuffle(
            Conv2d(nf * 4, 3, padding=1, name='upconv1')(out), 2))
        out = lrelu(pixel_shuffle(
            Conv2d(64 * 4, 3, padding=1, name='upconv2')(out), 2))
        out = lrelu(Conv2d(64, 3, padding=1, name='conv_hr')(out))
        out = Conv2d(3, 3, padding=1, name='conv_last')(out)
        if self.hr_in:
            base = x_center
        else:
            base = interpolate(x_center, scale_factor=4, mode='bilinear',
                               align_corners=False)
        return out + base
