"""Meters and terminal loggers (reference: logger.py)."""

import io

from sc_sfmlearner_release_tpu.utils.meters import (
    AverageMeter,
    ProgressLogger,
    TermLogger,
    make_logger,
)


def test_average_meter_multi():
    m = AverageMeter(i=2)
    m.update([1.0, 10.0])
    m.update([3.0, 30.0], n=3)
    assert m.val == [3.0, 30.0]
    assert m.avg == [(1 + 3 * 3) / 4, (10 + 30 * 3) / 4]
    assert "3.000" in repr(m)


def test_term_logger_renders_pinned_rows():
    out = io.StringIO()
    log = TermLogger(n_epochs=4, train_size=10, valid_size=5, stream=out)
    log.start_epoch(1)
    log.train_update(5, "Loss 1.234")
    log.valid_update(2, "Loss 0.5")
    log.write(" * Avg Loss : 1.000")
    log.finish()
    s = out.getvalue()
    # The block reservation, cursor save/restore, and row-pinned writes.
    assert s.startswith("\n" * TermLogger._BLOCK)
    assert "\0337" in s and "\0338" in s and "\033[2K" in s
    # Bars render fill + counters for each phase.
    assert "epoch:" in s and "1/4" in s
    assert "train:" in s and "5/10" in s and "50%" in s
    assert "valid:" in s and "2/5" in s
    assert "Loss 1.234" in s and " * Avg Loss : 1.000" in s
    # finish() completes the epoch bar and parks the cursor at the bottom.
    assert "4/4" in s


def test_term_logger_bar_clamps_overflow():
    out = io.StringIO()
    log = TermLogger(n_epochs=2, train_size=3, valid_size=1, stream=out)
    log.train_update(7)  # > train_size must clamp, not crash
    assert "3/3" in out.getvalue()


def test_make_logger_non_tty_falls_back():
    # pytest captures stdout (not a tty) -> plain line logger.
    log = make_logger(1, 1, 1, style="auto")
    assert isinstance(log, ProgressLogger)
    assert isinstance(make_logger(1, 1, 1, style="line"), ProgressLogger)
