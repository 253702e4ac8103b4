"""Resilience: graceful shutdown flag + watchdog stall detection."""

import os
import signal
import time

from samrs_tpu.core.resilience import GracefulShutdown, Watchdog


def test_graceful_shutdown_flag():
    gs = GracefulShutdown(signals=(signal.SIGUSR1,))
    assert not gs.should_stop
    os.kill(os.getpid(), signal.SIGUSR1)
    time.sleep(0.05)
    assert gs.should_stop
    gs.restore()


def test_watchdog_fires_and_resets():
    wd = Watchdog(timeout_s=0.2, name="t")
    time.sleep(0.5)
    assert wd.fired
    wd.beat()
    assert not wd.fired
    wd.stop()
