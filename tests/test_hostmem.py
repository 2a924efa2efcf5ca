"""Host allocator tuning (runtime/hostmem.py).

The pathology it fixes (measured on this container): glibc munmaps every
freed large block, so each collate's few-hundred-MB of fresh batch arrays
re-fault ~100k pages; under the sandboxed runtime a minor fault costs
~0.5 ms -> np.stack of one (8,4,1024,1024,3) f32 batch spends 47 s at 98%
system time. With the heap kept resident, the same stack is ~0.05 s.
"""

import numpy as np

from interactvlm_tpu.runtime.hostmem import tune_host_allocator


def test_tune_is_applied_and_idempotent():
    assert tune_host_allocator() is True
    assert tune_host_allocator() is True  # cached, still true


def test_large_batch_alloc_reuses_heap():
    # allocate/free a batch-sized array repeatedly; after the first
    # fault-in the pages must be reused (no per-iteration munmap). This
    # asserts behaviour, not timing: same virtual address block is handed
    # back by the allocator once warm.
    tune_host_allocator()
    shape = (8, 4, 64, 64, 3)  # small enough for CI, above mmap threshold
    addrs = set()
    for _ in range(4):
        a = np.empty(shape, np.float32)
        a.fill(0)
        addrs.add(a.__array_interface__["data"][0])
        del a
    assert len(addrs) == 1, addrs
