#!/usr/bin/env python
"""Frame-decompress stdin to stdout (reference examples/decompress.rs)."""

import shutil
import sys

from snappy_tpu import read


def main() -> None:
    dec = read.FrameDecoder(sys.stdin.buffer)
    shutil.copyfileobj(dec, sys.stdout.buffer)


if __name__ == "__main__":
    main()
