"""Clean-exit signal handling (reference: utils/distributed.py:12-23).

SIGINT/SIGTERM/SIGUSR2 set the EXIT event; the trainer polls it per iteration
and per epoch and returns cleanly so the last checkpoint survives preemption.
"""
from __future__ import annotations

import signal
import threading

EXIT = threading.Event()
EXIT.clear()


def _clean_exit_handler(signum, frame):
    EXIT.set()
    print("Exiting cleanly", flush=True)


def install_signal_handlers():
    for sig in (signal.SIGINT, signal.SIGTERM, signal.SIGUSR2):
        try:
            signal.signal(sig, _clean_exit_handler)
        except (ValueError, OSError):
            pass  # non-main thread or unsupported signal
