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
  one big-batch PCD trace with frames folded into the batch dim —
  better XLA/MXU utilization than a vmapped per-frame body;
* frames fold into the batch dim for feature extraction exactly like
  the reference (edvr_arch.py:376) but stay folded as one big conv
  batch for the MXU;
* all convs NHWC with explicit torch-style padding;
* the model is split into ``extract_pyramid`` / ``restore_windows``
  stages so whole-clip evaluation can compute each frame's feature
  pyramid ONCE and share it across the sliding windows (the reference
  recomputes it per window, edvr_arch.py:376-388 — a 5x redundancy);
  see :func:`make_clip_restore_fn`.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from edvr_tpu.archs.arch_util import (Conv2d, DCNv2Pack, ResidualBlockNoBN,
                                      WarpAlignPack, lrelu, make_layer)
from edvr_tpu.ops.resize import interpolate, pixel_shuffle
from edvr_tpu.utils.registry import ARCH_REGISTRY


class PCDAlignment(nn.Module):
    """Pyramid, Cascading and Deformable alignment
    (reference: edvr_arch.py:9-117)."""
    num_feat: int = 64
    deformable_groups: int = 8
    # 'dcn' = exact DCNv2 (checkpoint-compatible with the reference);
    # 'tap_shared' = warp-then-conv co-design variant (WarpAlignPack)
    align_variant: str = 'dcn'

    @nn.compact
    def __call__(self, nbr_feat_l, ref_feat_l):
        """nbr_feat_l/ref_feat_l: tuples of 3 NHWC arrays (L1, L2, L3)."""
        nf = self.num_feat
        pack_cls = {'dcn': DCNv2Pack,
                    'tap_shared': WarpAlignPack}[self.align_variant]
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

            feat = pack_cls(nf, 3, padding=1,
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
        feat = lrelu(pack_cls(nf, 3, padding=1,
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

    The forward is decomposed into stage methods so clip-mode
    evaluation can reuse per-frame work across sliding windows:

    * ``extract_pyramid(xf)``  — (n,h,w,c) frames -> L1/L2/L3 features;
    * ``restore_windows(pyr, clip, idx)`` — gather window features from
      a precomputed clip pyramid, PCD-align, TSA-fuse, reconstruct;
    * ``__call__`` — the reference-equivalent single-window forward,
      composed from the same stages.
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
    # alignment formulation: 'dcn' (exact DCNv2, official-checkpoint
    # compatible) or 'tap_shared' (warp-then-conv co-design variant —
    # see WarpAlignPack; a separate config family, quality-gated on the
    # training harness, docs/TPUDesign.md "Alignment co-design")
    align_variant: str = 'dcn'

    def setup(self):
        nf = self.num_feat
        center = self._center
        block_cls = nn.remat(ResidualBlockNoBN) if self.remat else \
            ResidualBlockNoBN
        if self.with_predeblur:
            self.predeblur = PredeblurModule(num_feat=nf, hr_in=self.hr_in)
            self.conv_1x1 = Conv2d(nf, 1, padding=0)
        else:
            self.conv_first = Conv2d(nf, 3, padding=1)
        self.feature_extraction = make_layer(
            block_cls, self.num_extract_block, num_feat=nf)
        self.conv_l2_1 = Conv2d(nf, 3, stride=2, padding=1)
        self.conv_l2_2 = Conv2d(nf, 3, padding=1)
        self.conv_l3_1 = Conv2d(nf, 3, stride=2, padding=1)
        self.conv_l3_2 = Conv2d(nf, 3, padding=1)
        self.pcd_align = PCDAlignment(
            num_feat=nf, deformable_groups=self.deformable_groups,
            align_variant=self.align_variant)
        if self.with_tsa:
            self.fusion = TSAFusion(num_feat=nf, num_frame=self.num_frame,
                                    center_frame_idx=center)
        else:
            self.fusion = Conv2d(nf, 1, padding=0)
        self.reconstruction = make_layer(
            block_cls, self.num_reconstruct_block, num_feat=nf)
        self.upconv1 = Conv2d(nf * 4, 3, padding=1)
        self.upconv2 = Conv2d(64 * 4, 3, padding=1)
        self.conv_hr = Conv2d(64, 3, padding=1)
        self.conv_last = Conv2d(3, 3, padding=1)

    @property
    def _center(self):
        return (self.num_frame // 2 if self.center_frame_idx is None else
                self.center_frame_idx)

    # ------------------------------------------------------------------ #
    # stages
    def extract_pyramid(self, xf):
        """Per-frame L1/L2/L3 feature pyramid
        (reference: edvr_arch.py:376-388).

        xf: (n, h, w, c) frames (any batch folding). Returns a tuple of
        (n, h, w, nf), (n, h/2, w/2, nf), (n, h/4, w/4, nf); with
        ``hr_in`` the L1 resolution is h/4 x w/4.
        """
        if self.with_predeblur:
            feat_l1 = self.conv_1x1(self.predeblur(xf))
        else:
            feat_l1 = lrelu(self.conv_first(xf))
        feat_l1 = self.feature_extraction(feat_l1)
        feat_l2 = lrelu(self.conv_l2_1(feat_l1))
        feat_l2 = lrelu(self.conv_l2_2(feat_l2))
        feat_l3 = lrelu(self.conv_l3_1(feat_l2))
        feat_l3 = lrelu(self.conv_l3_2(feat_l3))
        return feat_l1, feat_l2, feat_l3

    def fuse_reconstruct(self, aligned_feat, x_center):
        """TSA/1x1 fusion + reconstruction trunk + upsampling tail
        (reference: edvr_arch.py:405-419).

        aligned_feat: (b, t, h, w, nf); x_center: (b, H, W, c) LQ center
        frame (HR frame when ``hr_in``).
        """
        b, t, h, w, nf = aligned_feat.shape
        if self.with_tsa:
            feat = self.fusion(aligned_feat)
        else:
            # frame-major channel stacking (reference: edvr_arch.py:406)
            flat = aligned_feat.transpose(0, 2, 3, 1, 4).reshape(
                b, h, w, t * nf)
            feat = self.fusion(flat)

        out = self.reconstruction(feat)
        out = lrelu(pixel_shuffle(self.upconv1(out), 2))
        out = lrelu(pixel_shuffle(self.upconv2(out), 2))
        out = lrelu(self.conv_hr(out))
        out = self.conv_last(out)
        if self.hr_in:
            base = x_center
        else:
            base = interpolate(x_center, scale_factor=4, mode='bilinear',
                               align_corners=False)
        return out + base

    def restore_windows(self, pyr, clip, idx):
        """Restore a batch of output frames from a precomputed clip
        pyramid (clip-mode evaluation; the per-window path recomputes
        this pyramid 5x, reference: edvr_arch.py:376-388).

        pyr: tuple of clip pyramids (T, ..., nf); clip: (T, h, w, c) LQ
        frames; idx: (B, t) int32 window indices (from
        ``generate_frame_indices``; position t//2 is the output frame).
        Returns (B, 4h, 4w, c) restored frames.
        """
        B, t = idx.shape
        center = self._center
        flat_idx = idx.reshape(-1)
        ref_idx = jnp.repeat(idx[:, center], t)
        nbr_flat = tuple(jnp.take(f, flat_idx, axis=0) for f in pyr)
        ref_flat = tuple(jnp.take(f, ref_idx, axis=0) for f in pyr)
        aligned = self.pcd_align(nbr_flat, ref_flat)
        h, w, nf = aligned.shape[1:]
        aligned = aligned.reshape(B, t, h, w, nf)
        x_center = jnp.take(clip, idx[:, center], axis=0)
        return self.fuse_reconstruct(aligned, x_center)

    # ------------------------------------------------------------------ #
    def __call__(self, x):
        center = self._center
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
        feat_l1, feat_l2, feat_l3 = self.extract_pyramid(xf)
        if self.hr_in:
            h, w = h // 4, w // 4

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
        aligned_feat = self.pcd_align(nbr_flat, ref_flat).reshape(
            b, t, h, w, nf)

        return self.fuse_reconstruct(aligned_feat, x_center)


def clip_window_indices(num_frames_clip: int, num_frame: int,
                        padding: str = 'reflection_circle') -> np.ndarray:
    """(T, t) sliding-window index table for whole-clip evaluation,
    matching the per-frame windows the reference's VideoTestDataset
    builds (reference: video_test_dataset.py:44-147 via
    data_util.py:35-88)."""
    from edvr_tpu.data.data_util import generate_frame_indices
    return np.asarray([
        generate_frame_indices(i, num_frames_clip, num_frame, padding)
        for i in range(num_frames_clip)
    ], dtype=np.int32)


def make_clip_restore_fn(model: EDVR, win_batch: int = 4,
                         store_dtype=None, mode: str = 'window'):
    """Jitted whole-clip EDVR evaluation.

    Returns ``fn(params, clip, idx) -> (T, 4h, 4w, c)`` where clip is
    (T, h, w, c) and idx is the (T, t) int32 window table from
    :func:`clip_window_indices`. Windows are restored ``win_batch`` at
    a time under one ``lax.scan`` — one device dispatch for the whole
    clip, with the window batch sized for MXU/DCN-kernel utilization.

    mode selects the per-step formulation (both measured on v5e at the
    flagship 100x(180,320) shape — table in docs/TPUDesign.md "Clip
    evaluation"):

    * ``'window'`` (default): each step gathers ``win_batch`` windows
      of RAW frames (cheap: (t,h,w,3) rows) and runs the standard
      forward. Re-extracts each frame's pyramid per window exactly
      like the reference protocol (edvr_arch.py:376-388), but
      extraction is only ~10% of the model. Measured fastest at
      win_batch=1: 8.78 fps vs 8.11 host-dispatched per-window and
      8.64 for the best pyramid config.
    * ``'pyramid'``: compute the clip's L1/L2/L3 pyramid ONCE and
      gather windows of FEATURES per step. Does strictly less MXU
      work, but the 64-channel feature window gathers (~48 MB/window)
      cost about what the saved extraction does — measured slower at
      every win_batch (best 8.64 fps at win_batch=1), kept for the
      trade study.

    In BOTH modes per-window cost RISES with win_batch (window mode:
    113.9 ms/window at wb=1 -> 158 at wb=8): the graph outside the DCN
    kernels is HBM-bound, and each extra in-flight window adds ~74 MB
    f32 L1-shaped live intermediates whose traffic outweighs the saved
    scheduling. Full sweep: docs/TPUDesign.md "Clip evaluation".

    store_dtype: dtype of the RESIDENT clip pyramid (pyramid mode
    only). Default follows the DCN precision policy
    (edvr_tpu/ops/dcn.py): bf16 under the TPU-default matmul precision
    — the same rounding every conv/DCN already applies to its inputs
    on the MXU, halving both the pyramid's HBM residency (~1.9 GB f32
    at 100x(180,320)) and the per-scan-step window-gather traffic —
    f32 when f32/highest precision is pinned (parity tests, strict
    eval).
    """
    if store_dtype is None:
        prec = jax.config.jax_default_matmul_precision
        fast = prec in (None, 'default', 'fastest', 'bfloat16',
                        'tensorfloat32')
        store_dtype = jnp.bfloat16 if fast else jnp.float32
    if mode not in ('window', 'pyramid'):
        raise ValueError(f'unknown clip mode {mode!r}')

    @functools.partial(jax.jit, static_argnums=())
    def fn(params, clip, idx):
        T = clip.shape[0]
        t = idx.shape[1]
        if mode == 'pyramid':
            pyr = model.apply(params, clip, method=EDVR.extract_pyramid)
            pyr = tuple(f.astype(store_dtype) for f in pyr)

        n_steps = -(-T // win_batch)
        pad = n_steps * win_batch - T
        # pad with copies of the last window; sliced off after the scan
        idx_pad = jnp.concatenate(
            [idx, jnp.tile(idx[-1:], (pad, 1))], axis=0) if pad else idx
        idx_steps = idx_pad.reshape(n_steps, win_batch, -1)

        def body(_, idx_b):
            if mode == 'pyramid':
                out = model.apply(params, pyr, clip, idx_b,
                                  method=EDVR.restore_windows)
            else:
                wins = jnp.take(clip, idx_b.reshape(-1), axis=0)
                wins = wins.reshape(win_batch, t, *clip.shape[1:])
                out = model.apply(params, wins)
            return _, out

        _, outs = jax.lax.scan(body, None, idx_steps)
        outs = outs.reshape(n_steps * win_batch, *outs.shape[2:])
        return outs[:T]

    return fn
