"""Extract FFHQ images from tfrecords to PNGs
(reference: scripts/data_preparation/extract_images_from_tfrecords.py).
Requires tensorflow (available in this image)."""

import argparse
import os
import os.path as osp

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--tfrecord', required=True,
                        help='path to ffhq-rxx.tfrecords')
    parser.add_argument('--output', required=True, help='output folder')
    parser.add_argument('--resolution', type=int, default=256)
    args = parser.parse_args()

    import tensorflow as tf
    os.makedirs(args.output, exist_ok=True)
    ds = tf.data.TFRecordDataset(args.tfrecord)
    for idx, record in enumerate(ds):
        example = tf.train.Example()
        example.ParseFromString(record.numpy())
        shape = example.features.feature['shape'].int64_list.value
        data = example.features.feature['data'].bytes_list.value[0]
        img = np.frombuffer(data, np.uint8).reshape(shape)  # CHW RGB
        img = img.transpose(1, 2, 0)[:, :, ::-1]  # HWC BGR
        if img.shape[0] != args.resolution:
            img = cv2.resize(img, (args.resolution, args.resolution),
                             interpolation=cv2.INTER_AREA)
        cv2.imwrite(osp.join(args.output, f'{idx:08d}.png'), img)
        if idx % 100 == 0:
            print(f'extracted {idx}')
    print('done')


if __name__ == '__main__':
    main()
