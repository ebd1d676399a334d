import pytest

from tgm_tpu.exceptions import EventOrderedConversionError
from tgm_tpu.timedelta import TGB_TIME_DELTAS, TimeDeltaDG


def test_basic_units():
    assert TimeDeltaDG("s").convert("ms") == 1000
    assert TimeDeltaDG("h").convert("m") == 60
    assert TimeDeltaDG("m").convert("h") == pytest.approx(1 / 60)
    assert TimeDeltaDG("D").convert("h") == 24
    assert TimeDeltaDG("W").convert("D") == 7
    assert TimeDeltaDG("Y").convert("D") == 365


def test_value_multiplier():
    assert TimeDeltaDG("s", 30).convert("s") == 30
    assert TimeDeltaDG("m", 2).convert("s") == 120
    assert TimeDeltaDG("s", 30).convert("m") == pytest.approx(0.5)


def test_coarser():
    assert TimeDeltaDG("h").is_coarser_than("m")
    assert not TimeDeltaDG("m").is_coarser_than("h")
    assert not TimeDeltaDG("s").is_coarser_than("s")


def test_event_ordered():
    r = TimeDeltaDG("r")
    assert r.is_event_ordered
    assert not r.is_time_ordered
    with pytest.raises(EventOrderedConversionError):
        r.convert("s")
    with pytest.raises(EventOrderedConversionError):
        TimeDeltaDG("s").convert(r)
    with pytest.raises(ValueError):
        TimeDeltaDG("r", 2)


def test_invalid():
    with pytest.raises(ValueError):
        TimeDeltaDG("fortnight")
    with pytest.raises(ValueError):
        TimeDeltaDG("s", 0)
    with pytest.raises(ValueError):
        TimeDeltaDG("s", -1)


def test_tgb_tables():
    assert TGB_TIME_DELTAS["tgbl-wiki"].unit == "s"
    assert TGB_TIME_DELTAS["tgbn-trade"].unit == "Y"
    assert TGB_TIME_DELTAS["tkgl-polecat"].unit == "D"
