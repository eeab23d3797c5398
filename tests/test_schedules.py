import math

import numpy as np

from dualmessagepassing_tpu.train.schedules import (
    anneal_fn,
    cyclical_fn,
    lr_schedule,
    scalar_schedule,
)


def test_anneal_cosine_endpoints():
    # warm-in phase reverses values (anneal.py:20-29)
    v0 = anneal_fn("cosine", 0, num_init_steps=100, num_anneal_steps=1000,
                   value1=0.0, value2=1.0)
    assert v0 == 1.0  # starts at value2 during init reversal
    v_end = anneal_fn("cosine", 2000, num_init_steps=100,
                      num_anneal_steps=1000, value1=0.0, value2=1.0)
    assert v_end == 1.0
    # mid first half-cycle rises from value1
    v = anneal_fn("cosine", 100, num_init_steps=100, num_anneal_steps=1100,
                  num_cycles=1, value1=0.0, value2=1.0)
    assert v == 0.0


def test_anneal_linear_plateau():
    # with num_cycles=1: first half ramps, second half holds value2
    vals = [anneal_fn("linear", s, 0, 100, 1, 0.0, 1.0) for s in range(0, 100, 10)]
    assert vals[0] == 0.0
    assert abs(vals[2] - 0.4) < 1e-9
    assert all(v == 1.0 for v in vals[5:])
    # progress wraps at the boundary (%1 semantics, anneal.py:36)
    assert anneal_fn("linear", 100, 0, 100, 1, 0.0, 1.0) == 0.0


def test_cyclical_linear_triangle():
    vals = [cyclical_fn("linear", s, 0, 100, 1, 0.0, 1.0) for s in (0, 25, 50, 75)]
    assert vals[0] == 0.0
    assert abs(vals[1] - 0.5) < 1e-9
    assert abs(vals[2] - 1.0) < 1e-9
    assert abs(vals[3] - 0.5) < 1e-9


def test_scalar_schedule_parse():
    s = scalar_schedule("anneal_cosine$1.0$0.01", 1000)
    # num_init_steps=0 (train.py:508): no warm-in reversal, starts at value1
    assert abs(s(0) - 1.0) < 1e-9
    assert abs(s(2000) - 0.01) < 1e-9  # past schedule -> value2
    s2 = scalar_schedule(0.2, 1000)
    assert s2(500) == 0.2
    s3 = scalar_schedule("cyclical_linear$0.0$1.0", 1000)
    assert 0.0 <= s3(123) <= 1.0


def test_lr_schedules():
    f = lr_schedule("cosine_with_warmup_and_restart", num_warmup_steps=10,
                    num_schedule_steps=110, num_cycles=2, min_percent=1e-3)
    assert f(0) == 0.0
    assert abs(f(5) - 0.5) < 1e-9
    assert abs(f(10) - 1.0) < 1e-9  # warmup done, cos(0)=1
    # restart boundary: progress 0.5 -> (2*0.5)%1=0 -> multiplier 1 again
    assert abs(f(60) - 1.0) < 1e-9
    assert f(200) == 1e-3  # past schedule
    g = lr_schedule("linear_with_warmup", 10, 110)
    assert abs(g(60) - 0.5) < 1e-9

    c = lr_schedule("constant")
    assert c(12345) == 1.0
