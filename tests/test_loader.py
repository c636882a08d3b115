"""Threaded DataLoader semantics: ordering, drop_last, collate, workers."""

import numpy as np


class ToyDataset:
    def __init__(self, n=23):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {'x': np.full((2, 2), i, np.float32), 'idx': i,
                'path': f'p{i}'}


def test_loader_ordered_batches_with_workers():
    from edvr_tpu.data.loader import DataLoader
    loader = DataLoader(ToyDataset(), batch_size=4, shuffle=False,
                        num_workers=3, drop_last=False)
    batches = list(loader)
    assert len(loader) == 6 and len(batches) == 6
    flat = np.concatenate([b['idx'] for b in batches])
    np.testing.assert_array_equal(flat, np.arange(23))
    assert batches[0]['x'].shape == (4, 2, 2)
    assert batches[0]['path'] == ['p0', 'p1', 'p2', 'p3']
    assert batches[-1]['x'].shape == (3, 2, 2)  # remainder kept


def test_loader_drop_last_and_shuffle_determinism():
    from edvr_tpu.data.loader import DataLoader
    loader = DataLoader(ToyDataset(), batch_size=4, shuffle=True,
                        num_workers=0, drop_last=True, seed=7)
    b1 = [b['idx'].tolist() for b in loader]
    assert len(b1) == 5 and all(len(b) == 4 for b in b1)
    loader2 = DataLoader(ToyDataset(), batch_size=4, shuffle=True,
                         num_workers=0, drop_last=True, seed=7)
    b2 = [b['idx'].tolist() for b in loader2]
    assert b1 == b2  # same seed + epoch -> same order


def test_loader_with_sampler():
    from edvr_tpu.data.data_sampler import EnlargedSampler
    from edvr_tpu.data.loader import DataLoader
    ds = ToyDataset(10)
    sampler = EnlargedSampler(ds, num_replicas=2, rank=0, ratio=2)
    sampler.set_epoch(0)
    loader = DataLoader(ds, batch_size=5, sampler=sampler, num_workers=2,
                        drop_last=True)
    batches = list(loader)
    assert len(batches) == 2  # 10 samples for this rank


def test_device_prefetcher_queue_stays_full_under_slow_consumer():
    """The prefetch queue must be back at full depth after every
    next() when the consumer (train step) is slower than the producer
    — the property that hides host decode latency behind device
    compute (reference: the CUDA-stream prefetcher,
    prefetch_dataloader.py:84-126)."""
    import time

    from edvr_tpu.data.loader import DataLoader, DevicePrefetcher

    class SlowDataset:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            time.sleep(0.01)  # 10 ms decode
            return {'idx': np.asarray([i])}

    loader = DataLoader(SlowDataset(), batch_size=2, num_workers=4,
                        prefetch_batches=4)
    pf = DevicePrefetcher(loader, put_fn=lambda b: b, depth=2)
    pf.reset()
    seen = 0
    waits = []
    while True:
        t0 = time.time()
        batch = pf.next()
        waits.append(time.time() - t0)
        if batch is None:
            break
        seen += 1
        remaining = len(loader) - seen
        # consumer is 3x slower than a worker batch; queue must be full
        # again whenever enough batches remain to fill it
        time.sleep(0.06)
        assert len(pf._queue) == min(2, remaining), (seen, len(pf._queue))
    assert seen == len(loader)
    # past warmup the consumer never waits on the host pipeline
    assert float(np.median(waits[2:])) < 0.05, waits
