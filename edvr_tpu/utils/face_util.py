"""Face restoration helper: detection, landmark alignment, paste-back
(reference: basicsr/utils/face_util.py:16-217).

dlib provides detection/landmarks and is gated (it is optional in this
environment, matching the reference's soft import). The similarity
transform is estimated with the Umeyama algorithm directly (the
reference used skimage.transform.SimilarityTransform, which wraps the
same estimator).
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from edvr_tpu.utils import imwrite

try:
    import dlib
    HAS_DLIB = True
except ImportError:
    HAS_DLIB = False


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (rotation+scale+translation)
    mapping src -> dst; returns a 3x3 homogeneous matrix (Umeyama 1991,
    the estimator behind skimage's SimilarityTransform)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    num, dim = src.shape
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_demean = src - src_mean
    dst_demean = dst - dst_mean
    A = dst_demean.T @ src_demean / num
    d = np.ones((dim,), np.float64)
    if np.linalg.det(A) < 0:
        d[dim - 1] = -1
    T = np.eye(dim + 1, dtype=np.float64)
    U, S, Vt = np.linalg.svd(A)
    rank = np.linalg.matrix_rank(A)
    if rank == 0:
        return T * np.nan
    elif rank == dim - 1:
        if np.linalg.det(U) * np.linalg.det(Vt) > 0:
            T[:dim, :dim] = U @ Vt
        else:
            s = d[dim - 1]
            d[dim - 1] = -1
            T[:dim, :dim] = U @ np.diag(d) @ Vt
            d[dim - 1] = s
    else:
        T[:dim, :dim] = U @ np.diag(d) @ Vt
    scale = 1.0 / src_demean.var(axis=0).sum() * (S @ d)
    T[:dim, dim] = dst_mean - scale * (T[:dim, :dim] @ src_mean.T)
    T[:dim, :dim] *= scale
    return T


class FaceRestorationHelper:
    """(reference: face_util.py:16-217)"""

    def __init__(self, upscale_factor, face_size=512):
        self.upscale_factor = upscale_factor
        self.face_size = (face_size, face_size)
        # standard 5 landmarks for FFHQ faces at 1024x1024
        self.face_template = np.array([[686.77227723, 488.62376238],
                                       [586.77227723, 493.59405941],
                                       [337.91089109, 488.38613861],
                                       [437.95049505, 493.51485149],
                                       [513.58415842, 678.5049505]])
        self.face_template = self.face_template / (1024 // face_size)
        self.all_landmarks_5 = []
        self.all_landmarks_68 = []
        self.affine_matrices = []
        self.inverse_affine_matrices = []
        self.cropped_faces = []
        self.restored_faces = []
        self.save_png = True

    def init_dlib(self, detection_path, landmark5_path, landmark68_path):
        if not HAS_DLIB:
            raise ImportError(
                'dlib is required for face detection/landmarks. Install '
                'dlib to run the face restoration pipeline.')
        self.face_detector = dlib.cnn_face_detection_model_v1(detection_path)
        self.shape_predictor_5 = dlib.shape_predictor(landmark5_path)
        self.shape_predictor_68 = dlib.shape_predictor(landmark68_path)

    def free_dlib_gpu_memory(self):
        del self.face_detector
        del self.shape_predictor_5
        del self.shape_predictor_68

    def read_input_image(self, img_path):
        # (h, w, c) RGB
        img = cv2.imread(img_path)
        self.input_img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def detect_faces(self, img_path, upsample_num_times=1,
                     only_keep_largest=False):
        """(reference: face_util.py:56-87)"""
        self.read_input_image(img_path)
        det_faces = self.face_detector(self.input_img, upsample_num_times)
        if len(det_faces) == 0:
            print('No face detected. Try to increase upsample_num_times.')
            self.det_faces = det_faces
        elif only_keep_largest:
            areas = [(f.rect.right() - f.rect.left()) *
                     (f.rect.bottom() - f.rect.top()) for f in det_faces]
            self.det_faces = [det_faces[int(np.argmax(areas))]]
        else:
            self.det_faces = det_faces
        return len(self.det_faces)

    def get_face_landmarks_5(self):
        for face in self.det_faces:
            shape = self.shape_predictor_5(self.input_img, face.rect)
            landmark = np.array([[p.x, p.y] for p in shape.parts()])
            self.all_landmarks_5.append(landmark)
        return len(self.all_landmarks_5)

    def get_face_landmarks_68(self):
        """68 landmarks for each cropped face (reference: :96-131)."""
        num_detected_face = 0
        for idx, face in enumerate(self.cropped_faces):
            det_face = self.face_detector(face, 1)
            if len(det_face) == 0:
                print(f'Cannot find faces in cropped image with index {idx}.')
                self.all_landmarks_68.append(None)
                continue
            if len(det_face) > 1:
                areas = [(f.rect.right() - f.rect.left()) *
                         (f.rect.bottom() - f.rect.top()) for f in det_face]
                face_rect = det_face[int(np.argmax(areas))].rect
            else:
                face_rect = det_face[0].rect
            shape = self.shape_predictor_68(face, face_rect)
            self.all_landmarks_68.append(
                np.array([[p.x, p.y] for p in shape.parts()]))
            num_detected_face += 1
        return num_detected_face

    def warp_crop_faces(self, save_cropped_path=None,
                        save_inverse_affine_path=None):
        """Warp faces to the template; record inverse affines
        (reference: face_util.py:133-169)."""
        for idx, landmark in enumerate(self.all_landmarks_5):
            affine_matrix = umeyama_similarity(
                landmark, self.face_template)[0:2, :]
            self.affine_matrices.append(affine_matrix)
            cropped_face = cv2.warpAffine(self.input_img, affine_matrix,
                                          self.face_size)
            self.cropped_faces.append(cropped_face)
            if save_cropped_path is not None:
                path, ext = os.path.splitext(save_cropped_path)
                save_path = f'{path}_{idx:02d}.png' if self.save_png else \
                    f'{path}_{idx:02d}{ext}'
                imwrite(cv2.cvtColor(cropped_face, cv2.COLOR_RGB2BGR),
                        save_path)

            inverse_affine = umeyama_similarity(
                self.face_template,
                landmark * self.upscale_factor)[0:2, :]
            self.inverse_affine_matrices.append(inverse_affine)
            if save_inverse_affine_path is not None:
                path, _ = os.path.splitext(save_inverse_affine_path)
                np.save(f'{path}_{idx:02d}.npy', inverse_affine)

    def add_restored_face(self, face):
        self.restored_faces.append(face)

    def paste_faces_to_input_image(self, save_path):
        """Inverse-affine paste-back with soft edge blending
        (reference: face_util.py:173-210)."""
        input_img = cv2.cvtColor(self.input_img, cv2.COLOR_RGB2BGR)
        h, w, _ = input_img.shape
        h_up, w_up = h * self.upscale_factor, w * self.upscale_factor
        upsample_img = cv2.resize(input_img, (w_up, h_up))
        assert len(self.restored_faces) == len(self.inverse_affine_matrices)
        for restored_face, inverse_affine in zip(
                self.restored_faces, self.inverse_affine_matrices):
            inv_restored = cv2.warpAffine(restored_face, inverse_affine,
                                          (w_up, h_up))
            mask = np.ones((*self.face_size, 3), dtype=np.float32)
            inv_mask = cv2.warpAffine(mask, inverse_affine, (w_up, h_up))
            inv_mask_erosion = cv2.erode(
                inv_mask, np.ones((2 * self.upscale_factor,
                                   2 * self.upscale_factor), np.uint8))
            inv_restored_remove_border = inv_mask_erosion * inv_restored
            total_face_area = np.sum(inv_mask_erosion) // 3
            w_edge = int(total_face_area**0.5) // 20
            erosion_radius = w_edge * 2
            inv_mask_center = cv2.erode(
                inv_mask_erosion,
                np.ones((erosion_radius, erosion_radius), np.uint8))
            blur_size = w_edge * 2
            inv_soft_mask = cv2.GaussianBlur(
                inv_mask_center, (blur_size + 1, blur_size + 1), 0)
            upsample_img = inv_soft_mask * inv_restored_remove_border + (
                1 - inv_soft_mask) * upsample_img
        if self.save_png:
            save_path = save_path.replace('.jpg', '.png').replace(
                '.jpeg', '.png')
        imwrite(upsample_img.astype(np.uint8), save_path)

    def clean_all(self):
        self.all_landmarks_5 = []
        self.all_landmarks_68 = []
        self.restored_faces = []
        self.affine_matrices = []
        self.cropped_faces = []
        self.inverse_affine_matrices = []
