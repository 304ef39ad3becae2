#!/usr/bin/env python
"""ThreadSanitizer harness for the native async loader.

The reference has no race detection of any kind (SURVEY.md §5); this
framework ships first-party threaded C++ (runtime/native/loader.cpp), so
races there are a real failure mode.  This tool builds the runtime with
``-fsanitize=thread`` and hammers the loader's concurrency surface:

  * many submit/next cycles over a multi-thread pool with a tiny capacity
    (maximal contention on the done-map / order-queue / capacity predicate)
  * close() racing in-flight decodes
  * destroy() with work still queued (the dying path)

TSan reports go to stderr; a nonzero exit means a race or a hang.

Run from the repo root:  python tools/tsan_check.py
(TSan needs to be loaded into the *main* binary; ctypes-loading a TSan
library into a stock CPython mostly works on Linux because libtsan is
linked into the .so, but if it aborts with an interceptor error, run as
``LD_PRELOAD=$(g++ -print-file-name=libtsan.so) python tools/tsan_check.py``.)
"""

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
NATIVE = os.path.join(REPO, "rnn_speech_tpu", "runtime", "native")
TSAN_LIB = os.path.join(NATIVE, "librst_runtime_tsan.so")


def build() -> None:
    proc = subprocess.run(
        ["make", "-C", NATIVE, "tsan"], capture_output=True, text=True
    )
    if proc.returncode != 0:
        print(proc.stderr, file=sys.stderr)
        raise SystemExit("TSan build failed (is g++ built with libtsan?)")


def bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    from rnn_speech_tpu.runtime.loader import _bind

    return _bind(lib)


def make_corpus(root: str, n: int = 12):
    from rnn_speech_tpu import audio_io

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"c{i}.wav")
        audio_io.write_wav(
            p, (rng.normal(0, 0.2, 4000 + 317 * i) * 20000).astype(np.int16),
            16000,
        )
        paths.append(p.encode())
    # One unreadable path exercises the error branch under contention.
    paths.append(os.path.join(root, "missing.wav").encode())
    return paths


def drain(lib, handle, buf) -> int:
    got = 0
    while True:
        index = ctypes.c_int64()
        n = ctypes.c_int64()
        rc = lib.rst_loader_next(
            handle, ctypes.byref(index),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(buf), ctypes.byref(n),
        )
        if rc == -1:
            return got
        got += 1


def load_tsan_lib() -> ctypes.CDLL:
    try:
        return ctypes.CDLL(TSAN_LIB)
    except OSError as exc:
        if "static TLS" not in str(exc) or os.environ.get("_RST_TSAN_REEXEC"):
            raise
        # libtsan needs to be loaded before the interpreter allocates its
        # TLS: re-exec with LD_PRELOAD.
        cxx = os.environ.get("CXX", "g++")
        try:
            tsan = subprocess.run(
                [cxx, "-print-file-name=libtsan.so"],
                capture_output=True, text=True,
            ).stdout.strip()
        except OSError:
            raise SystemExit(
                f"Cannot locate the TSan runtime via {cxx!r}; run manually "
                "with LD_PRELOAD=<path to your toolchain's libtsan.so>"
            )
        env = dict(os.environ, LD_PRELOAD=tsan, _RST_TSAN_REEXEC="1")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main() -> int:
    # Watchdog: a loader deadlock (the exact bug class this harness hunts)
    # would block rst_loader_next forever; die loudly instead of hanging.
    import signal

    def _on_timeout(signum, frame):
        raise SystemExit("TSAN HARNESS TIMEOUT: loader appears deadlocked")

    signal.signal(signal.SIGALRM, _on_timeout)
    signal.alarm(600)

    build()
    lib = bind(load_tsan_lib())
    with tempfile.TemporaryDirectory() as root:
        paths = make_corpus(root)
        buf = np.empty((1 << 18,), np.float32)

        # 1) Contended submit/next cycles, tiny capacity.
        for round_i in range(30):
            handle = lib.rst_loader_create(4, 1 << 18, 22050, 2)
            for i, p in enumerate(paths):
                lib.rst_loader_submit(handle, i, p)
            lib.rst_loader_close(handle)
            got = drain(lib, handle, buf)
            assert got == len(paths), (round_i, got)
            lib.rst_loader_destroy(handle)

        # 2) Destroy with work still queued (dying path races workers).
        for _ in range(30):
            handle = lib.rst_loader_create(4, 1 << 18, 22050, 2)
            for i, p in enumerate(paths):
                lib.rst_loader_submit(handle, i, p)
            lib.rst_loader_destroy(handle)

        # 3) Interleaved submit and next (consumer ahead of producer).
        handle = lib.rst_loader_create(3, 1 << 18, 22050, 4)
        taken = 0
        for i, p in enumerate(paths * 5):
            lib.rst_loader_submit(handle, i, p)
            if i % 3 == 0:
                index = ctypes.c_int64()
                n = ctypes.c_int64()
                rc = lib.rst_loader_next(
                    handle, ctypes.byref(index),
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    len(buf), ctypes.byref(n),
                )
                assert rc != -1
                taken += 1
        lib.rst_loader_close(handle)
        taken += drain(lib, handle, buf)
        assert taken == len(paths) * 5, taken
        lib.rst_loader_destroy(handle)

    print("TSAN HARNESS PASSED (check stderr for sanitizer reports)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
