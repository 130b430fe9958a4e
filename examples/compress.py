#!/usr/bin/env python
"""Frame-compress stdin to stdout (reference examples/compress.rs)."""

import shutil
import sys

from snappy_tpu import write


def main() -> None:
    enc = write.FrameEncoder(sys.stdout.buffer)
    shutil.copyfileobj(sys.stdin.buffer, enc)
    enc.flush()


if __name__ == "__main__":
    main()
