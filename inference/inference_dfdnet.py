"""DFDNet face restoration pipeline
(reference: inference/inference_dfdnet.py): dlib detection + 5/68
landmarks -> warp-crop to 512 -> DFDNet with part dictionaries ->
inverse-affine paste back. Requires dlib (gated) plus the converted
DFDNet checkpoint, part dictionary, and dlib model files.

Usage:
    python inference/inference_dfdnet.py --test_path datasets/TestWhole
"""

import argparse
import glob
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def get_part_location(landmarks):
    """Part locations (left eye, right eye, nose, mouth) from 68
    landmarks (reference: inference/inference_dfdnet.py:14-59)."""
    map_left_eye = list(np.hstack((range(17, 22), range(36, 42))))
    map_right_eye = list(np.hstack((range(22, 27), range(42, 48))))
    map_nose = list(range(29, 36))
    map_mouth = list(range(48, 68))

    def part_location(landmarks, map_idx):
        part = landmarks[map_idx]
        mean = np.mean(part, axis=0)
        # half window = max(spread/2, 16) (reference: :23-26)
        half_len = np.max((np.max(
            np.max(part, 0) - np.min(part, 0)) / 2, 16))
        loc = np.hstack((mean - half_len + 1, mean + half_len)).astype(int)
        return loc[None]

    return (part_location(landmarks, map_left_eye),
            part_location(landmarks, map_right_eye),
            part_location(landmarks, map_nose),
            part_location(landmarks, map_mouth))


def main():
    import jax
    import jax.numpy as jnp

    from edvr_tpu.archs.dfdnet_arch import DFDNet
    from edvr_tpu.convert import convert_state_dict, load_torch_weights
    from edvr_tpu.convert.torch_import import fold_spectral_norm
    from edvr_tpu.utils.face_util import FaceRestorationHelper

    parser = argparse.ArgumentParser()
    parser.add_argument('--upscale_factor', type=int, default=2)
    parser.add_argument('--model_path', type=str,
                        default='experiments/pretrained_models/DFDNet.pth')
    parser.add_argument(
        '--dict_path', type=str,
        default='experiments/pretrained_models/DFDNet_dict_512.pth')
    parser.add_argument('--test_path', type=str,
                        default='datasets/TestWhole')
    parser.add_argument('--upsample_num_times', type=int, default=1)
    parser.add_argument('--save_inverse_affine', action='store_true')
    parser.add_argument('--only_keep_largest', action='store_true')
    # dlib models
    parser.add_argument(
        '--detection_path', type=str,
        default='experiments/pretrained_models/dlib/'
        'mmod_human_face_detector.dat')
    parser.add_argument(
        '--landmark5_path', type=str,
        default='experiments/pretrained_models/dlib/'
        'shape_predictor_5_face_landmarks.dat')
    parser.add_argument(
        '--landmark68_path', type=str,
        default='experiments/pretrained_models/dlib/'
        'shape_predictor_68_face_landmarks.dat')
    args = parser.parse_args()

    result_root = f'results/DFDNet/{osp.basename(args.test_path)}'

    # network
    net = DFDNet(num_feat=64)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 512, 512, 3)),
                         [np.array([[100, 100, 180, 180]])] * 4,
                         _dummy_dict())
    state = fold_spectral_norm(load_torch_weights(args.model_path))
    params, unmatched = convert_state_dict(state, variables['params'])
    if unmatched:
        print('warning: unconverted keys:', unmatched)

    # part dictionary: {size: {part: (k, c, h, w) torch}} -> NHWC
    import torch
    raw_dict = torch.load(args.dict_path, map_location='cpu')
    dict_feat = {
        k: {kk: jnp.asarray(np.moveaxis(vv.numpy(), 1, -1))
            for kk, vv in v.items()}
        for k, v in raw_dict.items()
    }

    face_helper = FaceRestorationHelper(args.upscale_factor, face_size=512)
    face_helper.init_dlib(args.detection_path, args.landmark5_path,
                          args.landmark68_path)

    for img_path in sorted(glob.glob(osp.join(args.test_path, '*'))):
        img_name = osp.basename(img_path)
        print(f'Processing {img_name} ...')
        save_crop_path = osp.join(result_root, 'cropped_faces', img_name)

        face_helper.clean_all()
        num_det_faces = face_helper.detect_faces(
            img_path, upsample_num_times=args.upsample_num_times,
            only_keep_largest=args.only_keep_largest)
        face_helper.get_face_landmarks_5()
        face_helper.warp_crop_faces(save_crop_path)

        assert face_helper.get_face_landmarks_68() == num_det_faces, (
            'Detected faces and landmark-68 faces are different.')
        for idx, (cropped_face, landmarks) in enumerate(
                zip(face_helper.cropped_faces,
                    face_helper.all_landmarks_68)):
            if landmarks is None:
                res = cropped_face
            else:
                part_locations = get_part_location(landmarks)
                x = jnp.asarray(
                    cropped_face.astype(np.float32)[None] / 255. * 2 - 1)
                out = net.apply({'params': params}, x, part_locations,
                                dict_feat)
                res = np.asarray((out[0] + 1) / 2)
                res = (np.clip(res, 0, 1) * 255.).round().astype(np.uint8)
            import cv2
            cv2.imwrite(
                osp.join(result_root, 'restored_faces',
                         f'{osp.splitext(img_name)[0]}_{idx:02d}.png'),
                cv2.cvtColor(res, cv2.COLOR_RGB2BGR))
            face_helper.add_restored_face(res[..., ::-1])  # to BGR

        face_helper.paste_faces_to_input_image(
            osp.join(result_root, 'final_results', img_name))

    print(f'All results are saved in {result_root}')


def _dummy_dict():
    """Tiny dictionary pytree for shape init."""
    import jax.numpy as jnp
    sizes = {'256': 128, '128': 256, '64': 512, '32': 512}
    return {
        k: {part: jnp.zeros((2, 8, 8, c))
            for part in ('left_eye', 'right_eye', 'nose', 'mouth')}
        for k, c in sizes.items()
    }


if __name__ == '__main__':
    main()
