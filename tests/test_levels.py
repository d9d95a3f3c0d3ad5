"""Level-table coverage: every strategy class compiles + decodes.

Split out of test_api.py: these are the heaviest compile accumulations in
the suite (one staged-pipeline compile per level class), and the XLA:CPU
LLVM crash threshold is per-process — give them their own xdist worker.
"""

import pytest
import zstandard

from tpu_zstd.api.config import CompressionConfig
from tpu_zstd.api.manager import ExecutionPath, Manager


@pytest.fixture()
def dctx():
    return zstandard.ZstdDecompressor()


def test_levels_all_decode(dctx):
    data = b"level sweep data - the quick brown fox " * 500
    sizes = {}
    for level in (1, 3, 5, 9, 12, 19, 22):
        cfg = CompressionConfig.from_level(level)
        cfg.block_size = 16384
        cfg.hash_log = min(cfg.hash_log, 14)
        with Manager(config=cfg, execution_path=ExecutionPath.TPU_BATCH) as m:
            c = m.compress(data)
        assert dctx.decompress(c, max_output_size=len(data)) == data, f"L{level}"
        sizes[level] = len(c)
    assert sizes[22] <= sizes[1], "higher level should not be worse here"




def test_lazy_levels_decode(dctx):
    data = b"abcabcabcabcxyzxyzabcabc" * 400
    cfg = CompressionConfig.from_level(7)  # LAZY2 strategy
    cfg.block_size = 4096
    cfg.hash_log = 13
    with Manager(config=cfg, execution_path=ExecutionPath.TPU_BATCH) as m:
        c = m.compress(data)
    assert dctx.decompress(c, max_output_size=len(data)) == data
