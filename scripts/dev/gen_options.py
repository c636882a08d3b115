"""Generate the full set of train/test option files mirroring the
reference's options/ tree (same keys, same hyperparameters, same
dataset layout). Run from the repo root:

    python scripts/dev/gen_options.py
"""

import copy
import os

import yaml

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))


_CLIP_MODE_COMMENT = (
    '  # whole-clip evaluation: per-frame feature pyramids computed '
    'once per\n'
    '  # clip, windows restored in device batches (edvr_tpu-only fast '
    'path;\n'
    '  # same window protocol as the reference per-window evaluation,\n'
    '  # parity tested in tests/test_edvr_clip.py)\n')


def dump(relpath, opt):
    path = os.path.join(ROOT, 'options', relpath)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    text = yaml.safe_dump(opt, sort_keys=False, default_flow_style=None)
    # annotate the TPU-only clip-eval keys (yaml.safe_dump cannot emit
    # comments; the committed files carry this explanation)
    text = text.replace('\n  clip_mode: true',
                        '\n' + _CLIP_MODE_COMMENT + '  clip_mode: true')
    # network_g is emitted flow-style, so the variant note goes on the
    # line above the block
    text = text.replace(
        '\nnetwork_g: {type: EDVR, num_in_ch: 3, num_out_ch: 3, '
        'num_feat: 64, num_frame: 5, deformable_groups: 8,\n'
        '  num_extract_block: 5, num_reconstruct_block: 10, '
        'center_frame_idx: null, hr_in: false,\n'
        '  with_predeblur: false, with_tsa: true, '
        'align_variant: tap_shared}',
        '\n# align_variant tap_shared = TPU co-design track: one '
        'offset/mask per\n'
        '# deformable group (WarpAlignPack warp-then-dense-conv), NOT\n'
        '# checkpoint-compatible with DCNv2Pack. Measured frontier vs '
        'the exact op:\n'
        '# docs/TPUDesign.md "Alignment co-design frontier".\n'
        'network_g: {type: EDVR, num_in_ch: 3, num_out_ch: 3, '
        'num_feat: 64, num_frame: 5, deformable_groups: 8,\n'
        '  num_extract_block: 5, num_reconstruct_block: 10, '
        'center_frame_idx: null, hr_in: false,\n'
        '  with_predeblur: false, with_tsa: true, '
        'align_variant: tap_shared}')
    with open(path, 'w') as f:
        f.write(text)
    print('wrote', relpath)


LOGGER = dict(print_freq=100, save_checkpoint_freq=5000.0,
              use_tb_logger=True, wandb=dict(project=None, resume_id=None))


def div2k_train_set(scale, gt_size):
    return dict(
        name='DIV2K', type='PairedImageDataset',
        dataroot_gt='datasets/DIV2K/DIV2K_train_HR_sub',
        dataroot_lq=f'datasets/DIV2K/DIV2K_train_LR_bicubic/X{scale}_sub',
        filename_tmpl='{}', io_backend=dict(type='disk'),
        gt_size=gt_size, use_flip=True, use_rot=True, use_shuffle=True,
        num_worker_per_gpu=6, batch_size_per_gpu=16,
        dataset_enlarge_ratio=100, prefetch_mode=None)


def paired_val_set(name, scale, root=None):
    root = root or f'datasets/{name}'
    return dict(name=name, type='PairedImageDataset',
                dataroot_gt=f'{root}/GTmod12',
                dataroot_lq=f'{root}/LRbicx{scale}',
                io_backend=dict(type='disk'))


def sr_val(crop_border, save_img=False, y=False):
    return dict(val_freq=5000.0, save_img=save_img,
                metrics=dict(psnr=dict(type='calculate_psnr',
                                       crop_border=crop_border,
                                       test_y_channel=y),
                             ssim=dict(type='calculate_ssim',
                                       crop_border=crop_border,
                                       test_y_channel=y)))


# --------------------------------------------------------------------------
# MSRResNet / MSRGAN
# --------------------------------------------------------------------------
for scale in (2, 3, 4):
    opt = dict(
        name=f'001_MSRResNet_x{scale}_f64b16_DIV2K_1000k_B16G1',
        model_type='SRModel', scale=scale, num_gpu=1, manual_seed=0,
        datasets=dict(train=div2k_train_set(scale, 32 * scale),
                      val=paired_val_set('Set5', scale)),
        network_g=dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                       num_feat=64, num_block=16, upscale=scale),
        path=dict(pretrain_network_g=None, strict_load_g=True,
                  resume_state=None),
        train=dict(
            optim_g=dict(type='Adam', lr=2e-4, weight_decay=0,
                         betas=[0.9, 0.99]),
            scheduler=dict(type='CosineAnnealingRestartLR',
                           periods=[250000] * 4,
                           restart_weights=[1] * 4, eta_min=1e-7),
            total_iter=1000000, warmup_iter=-1,
            pixel_opt=dict(type='L1Loss', loss_weight=1.0,
                           reduction='mean')),
        val=sr_val(scale), logger=copy.deepcopy(LOGGER))
    dump(f'train/SRResNet_SRGAN/train_MSRResNet_x{scale}.yml', opt)

msrgan = dict(
    name='004_MSRGAN_x4_f64b16_DIV2K_400k_B16G1',
    model_type='SRGANModel', scale=4, num_gpu=1, manual_seed=0,
    datasets=dict(train=div2k_train_set(4, 128),
                  val=paired_val_set('Set14', 4)),
    network_g=dict(type='MSRResNet', num_in_ch=3, num_out_ch=3,
                   num_feat=64, num_block=16, upscale=4),
    network_d=dict(type='VGGStyleDiscriminator128', num_in_ch=3,
                   num_feat=64),
    path=dict(
        pretrain_network_g='experiments/001_MSRResNet_x4_f64b16_DIV2K_'
        '1000k_B16G1/models/net_g_1000000.ckpt',
        strict_load_g=True, resume_state=None),
    train=dict(
        optim_g=dict(type='Adam', lr=1e-4, weight_decay=0,
                     betas=[0.9, 0.99]),
        optim_d=dict(type='Adam', lr=1e-4, weight_decay=0,
                     betas=[0.9, 0.99]),
        scheduler=dict(type='MultiStepLR',
                       milestones=[50000, 100000, 200000, 300000],
                       gamma=0.5),
        total_iter=400000, warmup_iter=-1,
        pixel_opt=dict(type='L1Loss', loss_weight=1e-2, reduction='mean'),
        perceptual_opt=dict(type='PerceptualLoss',
                            layer_weights={'conv5_4': 1},
                            vgg_type='vgg19', use_input_norm=True,
                            range_norm=False, perceptual_weight=1.0,
                            style_weight=0, criterion='l1'),
        gan_opt=dict(type='GANLoss', gan_type='vanilla',
                     real_label_val=1.0, fake_label_val=0.0,
                     loss_weight=5e-3),
        net_d_iters=1, net_d_init_iters=0),
    val=sr_val(4, save_img=True), logger=copy.deepcopy(LOGGER))
dump('train/SRResNet_SRGAN/train_MSRGAN_x4.yml', msrgan)

# --------------------------------------------------------------------------
# EDSR (M: 64f/16b, L: 256f/32b res_scale 0.1)
# --------------------------------------------------------------------------
for size, feats, blocks, res_scale in (('M', 64, 16, 1), ('L', 256, 32,
                                                          0.1)):
    for scale in (2, 3, 4):
        opt = dict(
            name=f'20x_EDSR_{size}x{scale}_DIV2K_300k_B16G1',
            model_type='SRModel', scale=scale, num_gpu=1, manual_seed=10,
            datasets=dict(train=div2k_train_set(scale, 48 * scale),
                          val=paired_val_set('Set5', scale)),
            network_g=dict(type='EDSR', num_in_ch=3, num_out_ch=3,
                           num_feat=feats, num_block=blocks, upscale=scale,
                           res_scale=res_scale, img_range=255.0,
                           rgb_mean=[0.4488, 0.4371, 0.4040]),
            path=dict(pretrain_network_g=None, strict_load_g=False,
                      resume_state=None),
            train=dict(
                optim_g=dict(type='Adam', lr=1e-4, weight_decay=0,
                             betas=[0.9, 0.99]),
                scheduler=dict(type='MultiStepLR', milestones=[200000],
                               gamma=0.5),
                total_iter=300000, warmup_iter=-1,
                pixel_opt=dict(type='L1Loss', loss_weight=1.0,
                               reduction='mean')),
            val=sr_val(scale), logger=copy.deepcopy(LOGGER))
        dump(f'train/EDSR/train_EDSR_{size}x{scale}.yml', opt)

# --------------------------------------------------------------------------
# RCAN
# --------------------------------------------------------------------------
rcan = dict(
    name='301_RCAN_x2_DIV2K_1000k_B16G1',
    model_type='SRModel', scale=2, num_gpu=1, manual_seed=10,
    datasets=dict(train=div2k_train_set(2, 96),
                  val=paired_val_set('Set5', 2)),
    network_g=dict(type='RCAN', num_in_ch=3, num_out_ch=3, num_feat=64,
                   num_group=10, num_block=20, squeeze_factor=16,
                   upscale=2, res_scale=1, img_range=255.0,
                   rgb_mean=[0.4488, 0.4371, 0.4040]),
    path=dict(pretrain_network_g=None, strict_load_g=True,
              resume_state=None),
    train=dict(
        optim_g=dict(type='Adam', lr=1e-4, weight_decay=0,
                     betas=[0.9, 0.99]),
        scheduler=dict(type='MultiStepLR', milestones=[200000, 400000,
                                                       600000, 800000],
                       gamma=0.5),
        total_iter=1000000, warmup_iter=-1,
        pixel_opt=dict(type='L1Loss', loss_weight=1.0, reduction='mean')),
    val=sr_val(2, y=True), logger=copy.deepcopy(LOGGER))
dump('train/RCAN/train_RCAN_x2.yml', rcan)

# --------------------------------------------------------------------------
# ESRGAN / RRDBNet-PSNR
# --------------------------------------------------------------------------
rrdb_psnr = dict(
    name='051_RRDBNet_PSNR_x4_f64b23_DIV2K_1000k_B16G1',
    model_type='SRModel', scale=4, num_gpu=1, manual_seed=0,
    datasets=dict(train=div2k_train_set(4, 128),
                  val=paired_val_set('Set14', 4)),
    network_g=dict(type='RRDBNet', num_in_ch=3, num_out_ch=3, num_feat=64,
                   num_block=23),
    path=dict(pretrain_network_g=None, strict_load_g=True,
              resume_state=None),
    train=dict(
        optim_g=dict(type='Adam', lr=2e-4, weight_decay=0,
                     betas=[0.9, 0.99]),
        scheduler=dict(type='CosineAnnealingRestartLR',
                       periods=[250000] * 4, restart_weights=[1] * 4,
                       eta_min=1e-7),
        total_iter=1000000, warmup_iter=-1,
        pixel_opt=dict(type='L1Loss', loss_weight=1.0, reduction='mean')),
    val=sr_val(4), logger=copy.deepcopy(LOGGER))
dump('train/ESRGAN/train_RRDBNet_PSNR_x4.yml', rrdb_psnr)

esrgan = copy.deepcopy(msrgan)
esrgan.update(
    name='052_ESRGAN_x4_f64b23_DIV2K_400k_B16G1_051pretrain',
    model_type='ESRGANModel',
    network_g=dict(type='RRDBNet', num_in_ch=3, num_out_ch=3, num_feat=64,
                   num_block=23))
esrgan['path']['pretrain_network_g'] = (
    'experiments/051_RRDBNet_PSNR_x4_f64b23_DIV2K_1000k_B16G1/models/'
    'net_g_1000000.ckpt')
dump('train/ESRGAN/train_ESRGAN_x4.yml', esrgan)

# --------------------------------------------------------------------------
# EDVR (M/L, TSA/woTSA)
# --------------------------------------------------------------------------


def edvr_train(name, feat, extract, recon, tsa, pretrain, lr, periods,
               tsa_iter=None, align_variant=None):
    opt = dict(
        name=name, model_type='EDVRModel', scale=4, num_gpu=8,
        manual_seed=10,
        datasets=dict(
            train=dict(
                name='REDS', type='REDSDataset',
                dataroot_gt='datasets/REDS/train_sharp',
                dataroot_lq='datasets/REDS/train_sharp_bicubic',
                dataroot_flow=None,
                meta_info_file='edvr_tpu/data/meta_info/'
                'meta_info_REDS_GT.txt',
                val_partition='REDS4', io_backend=dict(type='disk'),
                num_frame=5, gt_size=256, interval_list=[1],
                random_reverse=False, use_flip=True, use_rot=True,
                use_shuffle=True, num_worker_per_gpu=3,
                batch_size_per_gpu=4, dataset_enlarge_ratio=200,
                prefetch_mode=None),
            val=dict(
                name='REDS4', type='VideoTestDataset',
                dataroot_gt='datasets/REDS/train_sharp',
                dataroot_lq='datasets/REDS/train_sharp_bicubic',
                meta_info_file='edvr_tpu/data/meta_info/'
                'meta_info_REDS4_test_GT.txt',
                io_backend=dict(type='disk'), cache_data=False,
                num_frame=5, padding='reflection_circle')),
        network_g=dict(type='EDVR', num_in_ch=3, num_out_ch=3,
                       num_feat=feat, num_frame=5, deformable_groups=8,
                       num_extract_block=extract,
                       num_reconstruct_block=recon, center_frame_idx=None,
                       hr_in=False, with_predeblur=False, with_tsa=tsa,
                       **(dict(align_variant=align_variant)
                          if align_variant else {})),
        path=dict(pretrain_network_g=pretrain,
                  strict_load_g=not tsa, resume_state=None),
        train=dict(
            optim_g=dict(type='Adam', lr=lr, weight_decay=0,
                         betas=[0.9, 0.99]),
            scheduler=dict(type='CosineAnnealingRestartLR',
                           periods=periods,
                           restart_weights=[1] * len(periods),
                           eta_min=1e-7),
            total_iter=sum(periods), warmup_iter=-1, dcn_lr_mul=1,
            # TPU-first addition over the reference config: bf16
            # compute with f32 master params — measured −8.1% step
            # time at identical numerics gates (docs/TPUDesign.md
            # "Round-5 harvest"); the reference trains f32.
            mixed_precision='bf16',
            pixel_opt=dict(type='CharbonnierLoss', loss_weight=1.0,
                           reduction='sum')),
        val=dict(val_freq=5000.0, save_img=False,
                 metrics=dict(psnr=dict(type='calculate_psnr',
                                        crop_border=0,
                                        test_y_channel=False))),
        logger=copy.deepcopy(LOGGER))
    if tsa_iter:
        opt['train']['tsa_iter'] = tsa_iter
        opt['find_unused_parameters'] = True
    return opt


dump('train/EDVR/train_EDVR_M_x4_SR_REDS_woTSA.yml',
     edvr_train('101_EDVR_M_x4_SR_REDS_woTSA_600k_B4G8', 64, 5, 10, False,
                None, 4e-4, [150000, 150000, 150000, 150000]))
dump('train/EDVR/train_EDVR_M_x4_SR_REDS.yml',
     edvr_train('102_EDVR_M_x4_SR_REDS_600k_B4G8_101pretrain', 64, 5, 10,
                True,
                'experiments/101_EDVR_M_x4_SR_REDS_woTSA_600k_B4G8/models/'
                'net_g_600000.ckpt', 4e-4,
                [50000, 100000, 150000, 150000, 150000], tsa_iter=50000))
dump('train/EDVR/train_EDVR_M_x4_SR_REDS_tapshared.yml',
     edvr_train('103_EDVR_M_x4_SR_REDS_tapshared_600k_B4G8', 64, 5, 10,
                True, None, 4e-4,
                [50000, 100000, 150000, 150000, 150000], tsa_iter=50000,
                align_variant='tap_shared'))
dump('train/EDVR/train_EDVR_L_x4_SR_REDS_woTSA.yml',
     edvr_train('201_EDVR_L_x4_SR_REDS_woTSA_600k_B4G8', 128, 5, 40, False,
                None, 4e-4, [150000, 150000, 150000, 150000]))
dump('train/EDVR/train_EDVR_L_x4_SR_REDS.yml',
     edvr_train('202_EDVR_L_x4_SR_REDS_600k_B4G8_201pretrain', 128, 5, 40,
                True,
                'experiments/201_EDVR_L_x4_SR_REDS_woTSA_600k_B4G8/models/'
                'net_g_600000.ckpt', 4e-4,
                [50000, 100000, 150000, 150000, 150000], tsa_iter=50000))

# --------------------------------------------------------------------------
# StyleGAN2 FFHQ 256
# --------------------------------------------------------------------------
sg2 = dict(
    name='501_StyleGAN2_256_Cmul2_FFHQ_800k_B24G8_scratch',
    model_type='StyleGAN2Model', num_gpu=8, manual_seed=0,
    datasets=dict(train=dict(
        name='FFHQ', type='FFHQDataset',
        dataroot_gt='datasets/ffhq/ffhq_256.lmdb',
        io_backend=dict(type='lmdb'), use_hflip=True,
        mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5], use_shuffle=True,
        num_worker_per_gpu=6, batch_size_per_gpu=3,
        dataset_enlarge_ratio=100, prefetch_mode=None)),
    network_g=dict(type='StyleGAN2Generator', out_size=256,
                   num_style_feat=512, num_mlp=8, channel_multiplier=2,
                   resample_kernel=[1, 3, 3, 1], lr_mlp=0.01),
    network_d=dict(type='StyleGAN2Discriminator', out_size=256,
                   channel_multiplier=2, resample_kernel=[1, 3, 3, 1]),
    path=dict(pretrain_network_g=None, strict_load_g=True,
              resume_state=None),
    train=dict(
        optim_g=dict(type='Adam', lr=2e-3),
        optim_d=dict(type='Adam', lr=2e-3),
        scheduler=dict(type='MultiStepLR', milestones=[600000], gamma=0.5),
        total_iter=800000, warmup_iter=-1,
        gan_opt=dict(type='GANLoss', gan_type='wgan_softplus',
                     loss_weight=1.0),
        r1_reg_weight=10, path_batch_shrink=2, path_reg_weight=2,
        net_g_reg_every=4, net_d_reg_every=16, mixing_prob=0.9),
    val=dict(val_freq=5000.0, num_val_samples=16, save_img=True),
    logger=copy.deepcopy(LOGGER))
dump('train/StyleGAN/train_StyleGAN2_256_Cmul2_FFHQ.yml', sg2)

# --------------------------------------------------------------------------
# test configs
# --------------------------------------------------------------------------


def sr_test(name, model_type, scale, network_g, pretrain, sets,
            crop_border=None, y=False, suffix=None):
    crop_border = scale if crop_border is None else crop_border
    datasets = {}
    for i, (ds_name, gt, lq, ds_type) in enumerate(sets, 1):
        d = dict(name=ds_name, type=ds_type, dataroot_gt=gt,
                 dataroot_lq=lq, io_backend=dict(type='disk'))
        if gt is None:
            d.pop('dataroot_gt')
        datasets[f'test_{i}'] = d
    opt = dict(name=name, model_type=model_type, scale=scale, num_gpu=1,
               manual_seed=0, datasets=datasets, network_g=network_g,
               path=dict(pretrain_network_g=pretrain, strict_load_g=True),
               val=dict(save_img=True, suffix=suffix))
    if sets[0][1] is not None:
        opt['val']['metrics'] = dict(
            psnr=dict(type='calculate_psnr', crop_border=crop_border,
                      test_y_channel=y),
            ssim=dict(type='calculate_ssim', crop_border=crop_border,
                      test_y_channel=y))
    return opt


for scale in (2, 3, 4):
    dump(f'test/SRResNet_SRGAN/test_MSRResNet_x{scale}.yml', sr_test(
        f'MSRResNet_x{scale}', 'SRModel', scale,
        dict(type='MSRResNet', num_in_ch=3, num_out_ch=3, num_feat=64,
             num_block=16, upscale=scale),
        f'experiments/pretrained_models/MSRResNet_x{scale}.ckpt',
        [('Set5', 'datasets/Set5/GTmod12', f'datasets/Set5/LRbicx{scale}',
          'PairedImageDataset'),
         ('Set14', 'datasets/Set14/GTmod12',
          f'datasets/Set14/LRbicx{scale}', 'PairedImageDataset'),
         ('DIV2K100', 'datasets/DIV2K/DIV2K_valid_HR',
          f'datasets/DIV2K/DIV2K_valid_LR_bicubic/X{scale}',
          'PairedImageDataset')]))
dump('test/SRResNet_SRGAN/test_MSRResNet_x4_woGT.yml', sr_test(
    'MSRResNet_x4_woGT', 'SRModel', 4,
    dict(type='MSRResNet', num_in_ch=3, num_out_ch=3, num_feat=64,
         num_block=16, upscale=4),
    'experiments/pretrained_models/MSRResNet_x4.ckpt',
    [('demo', None, 'datasets/demo', 'SingleImageDataset')]))
dump('test/SRResNet_SRGAN/test_MSRGAN_x4.yml', sr_test(
    'MSRGAN_x4', 'SRModel', 4,
    dict(type='MSRResNet', num_in_ch=3, num_out_ch=3, num_feat=64,
         num_block=16, upscale=4),
    'experiments/pretrained_models/MSRGAN_x4.ckpt',
    [('Set5', 'datasets/Set5/GTmod12', 'datasets/Set5/LRbicx4',
      'PairedImageDataset'),
     ('Set14', 'datasets/Set14/GTmod12', 'datasets/Set14/LRbicx4',
      'PairedImageDataset')]))

for size, feats, blocks, res_scale in (('M', 64, 16, 1),
                                       ('L', 256, 32, 0.1)):
    for scale in (2, 3, 4):
        dump(f'test/EDSR/test_EDSR_{size}x{scale}.yml', sr_test(
            f'EDSR_{size}x{scale}', 'SRModel', scale,
            dict(type='EDSR', num_in_ch=3, num_out_ch=3, num_feat=feats,
                 num_block=blocks, upscale=scale, res_scale=res_scale,
                 img_range=255.0, rgb_mean=[0.4488, 0.4371, 0.4040]),
            f'experiments/pretrained_models/EDSR_{size}x{scale}.ckpt',
            [('Set5', 'datasets/Set5/GTmod12',
              f'datasets/Set5/LRbicx{scale}', 'PairedImageDataset')]))

dump('test/ESRGAN/test_ESRGAN_x4.yml', sr_test(
    'ESRGAN_x4', 'SRModel', 4,
    dict(type='RRDBNet', num_in_ch=3, num_out_ch=3, num_feat=64,
         num_block=23),
    'experiments/pretrained_models/ESRGAN_x4.ckpt',
    [('Set5', 'datasets/Set5/GTmod12', 'datasets/Set5/LRbicx4',
      'PairedImageDataset'),
     ('Set14', 'datasets/Set14/GTmod12', 'datasets/Set14/LRbicx4',
      'PairedImageDataset')]))
dump('test/ESRGAN/test_RRDBNet_PSNR_x4.yml', sr_test(
    'RRDBNet_PSNR_x4', 'SRModel', 4,
    dict(type='RRDBNet', num_in_ch=3, num_out_ch=3, num_feat=64,
         num_block=23),
    'experiments/pretrained_models/RRDBNet_PSNR_x4.ckpt',
    [('Set5', 'datasets/Set5/GTmod12', 'datasets/Set5/LRbicx4',
      'PairedImageDataset'),
     ('Set14', 'datasets/Set14/GTmod12', 'datasets/Set14/LRbicx4',
      'PairedImageDataset')]))
dump('test/ESRGAN/test_ESRGAN_x4_woGT.yml', sr_test(
    'ESRGAN_x4_woGT', 'SRModel', 4,
    dict(type='RRDBNet', num_in_ch=3, num_out_ch=3, num_feat=64,
         num_block=23),
    'experiments/pretrained_models/ESRGAN_x4.ckpt',
    [('demo', None, 'datasets/demo', 'SingleImageDataset')]))

dump('test/RCAN/test_RCAN.yml', sr_test(
    'RCAN_x2', 'SRModel', 2,
    dict(type='RCAN', num_in_ch=3, num_out_ch=3, num_feat=64, num_group=10,
         num_block=20, squeeze_factor=16, upscale=2, res_scale=1,
         img_range=255.0, rgb_mean=[0.4488, 0.4371, 0.4040]),
    'experiments/pretrained_models/RCAN_x2.ckpt',
    [('Set5', 'datasets/Set5/GTmod12', 'datasets/Set5/LRbicx2',
      'PairedImageDataset')], y=True))


def edvr_test(name, feat, recon, predeblur, hr_in, dataset, pretrain,
              with_tsa=True):
    if dataset == 'REDS4':
        ds = dict(name='REDS4', type='VideoTestDataset',
                  dataroot_gt='datasets/REDS/train_sharp',
                  dataroot_lq='datasets/REDS/train_sharp_bicubic',
                  meta_info_file='edvr_tpu/data/meta_info/'
                  'meta_info_REDS4_test_GT.txt',
                  io_backend=dict(type='disk'), cache_data=True,
                  num_frame=5, padding='reflection_circle')
    elif dataset == 'Vid4':
        ds = dict(name='Vid4', type='VideoTestDataset',
                  dataroot_gt='datasets/Vid4/GT',
                  dataroot_lq='datasets/Vid4/BIx4',
                  io_backend=dict(type='disk'), cache_data=True,
                  num_frame=7, padding='reflection_circle')
    else:  # vimeo
        ds = dict(name='Vimeo90K', type='VideoTestVimeo90KDataset',
                  dataroot_gt='datasets/vimeo90k/vimeo_septuplet/sequences',
                  dataroot_lq='datasets/vimeo90k/'
                  'vimeo_septuplet_matlabLRx4/sequences',
                  meta_info_file='edvr_tpu/data/meta_info/'
                  'meta_info_Vimeo90K_test_GT.txt',
                  io_backend=dict(type='disk'), cache_data=False,
                  num_frame=7, padding='reflection_circle')
    num_frame = ds['num_frame']
    return dict(
        name=name, model_type='VideoBaseModel', scale=4, num_gpu=1,
        manual_seed=0, datasets=dict(test_1=ds),
        network_g=dict(type='EDVR', num_in_ch=3, num_out_ch=3,
                       num_feat=feat, num_frame=num_frame,
                       deformable_groups=8, num_extract_block=5,
                       num_reconstruct_block=recon, center_frame_idx=None,
                       hr_in=hr_in, with_predeblur=predeblur,
                       with_tsa=with_tsa),
        path=dict(pretrain_network_g=pretrain, strict_load_g=True),
        val=dict(save_img=True, suffix=None,
                 # clip_mode rides VideoTestDataset's whole-folder
                 # protocol; Vimeo90K is per-septuplet (its own dataset
                 # class) and falls back to per-window anyway
                 **(dict(clip_mode=True, clip_win_batch=1)
                    if dataset != 'Vimeo' else {}),
                 metrics=dict(psnr=dict(type='calculate_psnr',
                                        crop_border=0,
                                        test_y_channel=False))))


dump('test/EDVR/test_EDVR_M_x4_SR_REDS.yml', edvr_test(
    'EDVR_M_x4_SR_REDS', 64, 10, False, False, 'REDS4',
    'experiments/pretrained_models/EDVR_REDS_SR_M.ckpt'))
dump('test/EDVR/test_EDVR_L_x4_SR_REDS.yml', edvr_test(
    'EDVR_L_x4_SR_REDS', 128, 40, False, False, 'REDS4',
    'experiments/pretrained_models/EDVR_REDS_SR_L.ckpt'))
dump('test/EDVR/test_EDVR_L_x4_SR_Vid4.yml', edvr_test(
    'EDVR_L_x4_SR_Vid4', 128, 40, False, False, 'Vid4',
    'experiments/pretrained_models/EDVR_Vimeo90K_SR_L.ckpt'))
dump('test/EDVR/test_EDVR_L_x4_SR_Vimeo90K.yml', edvr_test(
    'EDVR_L_x4_SR_Vimeo90K', 128, 40, False, False, 'Vimeo',
    'experiments/pretrained_models/EDVR_Vimeo90K_SR_L.ckpt'))
dump('test/EDVR/test_EDVR_L_x4_SRblur_REDS.yml', edvr_test(
    'EDVR_L_x4_SRblur_REDS', 128, 40, True, False, 'REDS4',
    'experiments/pretrained_models/EDVR_REDS_SRblur_L.ckpt'))
dump('test/EDVR/test_EDVR_L_deblur_REDS.yml', edvr_test(
    'EDVR_L_deblur_REDS', 128, 40, True, True, 'REDS4',
    'experiments/pretrained_models/EDVR_REDS_deblur_L.ckpt'))
dump('test/EDVR/test_EDVR_L_deblurcomp_REDS.yml', edvr_test(
    'EDVR_L_deblurcomp_REDS', 128, 40, True, True, 'REDS4',
    'experiments/pretrained_models/EDVR_REDS_deblurcomp_L.ckpt'))

# DUF / TOF official-weight testing
duf = dict(
    name='DUF_x4_52L_official', model_type='VideoBaseModel', scale=4,
    num_gpu=1, manual_seed=0,
    datasets=dict(test_1=dict(
        name='Vid4', type='VideoTestDUFDataset',
        dataroot_gt='datasets/Vid4/GT', dataroot_lq='datasets/Vid4/BIx4',
        use_duf_downsampling=True, io_backend=dict(type='disk'),
        cache_data=True, num_frame=7, padding='reflection_circle')),
    network_g=dict(type='DUF', scale=4, num_layer=52,
                   adapt_official_weights=True),
    path=dict(
        pretrain_network_g='experiments/pretrained_models/'
        'DUF_x4_52L_official.ckpt', strict_load_g=True),
    val=dict(save_img=True, suffix=None,
             metrics=dict(psnr=dict(type='calculate_psnr', crop_border=8,
                                    test_y_channel=True))))
dump('test/DUF/test_DUF_official.yml', duf)

tof = dict(
    name='TOF_official', model_type='VideoBaseModel', scale=4, num_gpu=1,
    manual_seed=0,
    datasets=dict(test_1=dict(
        name='Vid4', type='VideoTestDataset',
        dataroot_gt='datasets/Vid4/GT',
        dataroot_lq='datasets/Vid4/BIx4up_direct',
        io_backend=dict(type='disk'), cache_data=True, num_frame=7,
        padding='reflection_circle')),
    network_g=dict(type='TOFlow', adapt_official_weights=True),
    path=dict(pretrain_network_g='experiments/pretrained_models/'
              'TOF_official.ckpt', strict_load_g=True),
    val=dict(save_img=True, suffix=None,
             metrics=dict(psnr=dict(type='calculate_psnr', crop_border=0,
                                    test_y_channel=True))))
dump('test/TOF/test_TOF_official.yml', tof)
print('all options written')

# --------------------------------------------------------------------------
# VideoGAN (EDVR generator + image discriminator on video data)
# --------------------------------------------------------------------------
vgan = dict(
    name='103_EDVRM_VideoGAN_REDS_B4G8',
    model_type='VideoGANModel', scale=4, num_gpu=8, manual_seed=10,
    datasets=dict(train=dict(
        name='REDS', type='REDSDataset',
        dataroot_gt='datasets/REDS/train_sharp',
        dataroot_lq='datasets/REDS/train_sharp_bicubic',
        dataroot_flow=None,
        meta_info_file='edvr_tpu/data/meta_info/meta_info_REDS_GT.txt',
        val_partition='REDS4', io_backend=dict(type='disk'), num_frame=5,
        gt_size=128, interval_list=[1], random_reverse=False,
        use_flip=True, use_rot=True, use_shuffle=True,
        num_worker_per_gpu=3, batch_size_per_gpu=4,
        dataset_enlarge_ratio=200, prefetch_mode=None)),
    network_g=dict(type='EDVR', num_in_ch=3, num_out_ch=3, num_feat=64,
                   num_frame=5, deformable_groups=8, num_extract_block=5,
                   num_reconstruct_block=10, center_frame_idx=None,
                   hr_in=False, with_predeblur=False, with_tsa=True),
    network_d=dict(type='VGGStyleDiscriminator128', num_in_ch=3,
                   num_feat=64),
    path=dict(
        pretrain_network_g='experiments/102_EDVR_M_x4_SR_REDS_600k_B4G8_'
        '101pretrain/models/net_g_600000.ckpt',
        strict_load_g=True, resume_state=None),
    train=dict(
        optim_g=dict(type='Adam', lr=1e-4, weight_decay=0,
                     betas=[0.9, 0.99]),
        optim_d=dict(type='Adam', lr=1e-4, weight_decay=0,
                     betas=[0.9, 0.99]),
        scheduler=dict(type='MultiStepLR',
                       milestones=[50000, 100000, 200000, 300000],
                       gamma=0.5),
        total_iter=400000, warmup_iter=-1,
        pixel_opt=dict(type='L1Loss', loss_weight=1e-2, reduction='mean'),
        gan_opt=dict(type='GANLoss', gan_type='vanilla',
                     real_label_val=1.0, fake_label_val=0.0,
                     loss_weight=5e-3),
        net_d_iters=1, net_d_init_iters=0),
    val=None,
    logger=copy.deepcopy(LOGGER))
vgan.pop('val')
dump('train/EDVR/train_EDVRM_VideoGAN_REDS.yml', vgan)
