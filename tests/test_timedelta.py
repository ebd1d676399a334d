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


# ------------------------------------------------------------------ #
# Reference-breadth additions (mirrors test_core/test_timedelta.py)
# ------------------------------------------------------------------ #
import itertools

UNITS = ["Y", "M", "W", "D", "h", "m", "s", "ms", "us", "ns"]
_SECS = {"Y": 365 * 86400, "M": 30 * 86400, "W": 7 * 86400, "D": 86400,
         "h": 3600, "m": 60, "s": 1, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}


def test_convert_same_unit_value_ratio():
    for u in UNITS:
        assert TimeDeltaDG(u, 2).convert(TimeDeltaDG(u, 3)) == pytest.approx(2 / 3)
        assert TimeDeltaDG(u, 3).convert(TimeDeltaDG(u, 2)) == pytest.approx(3 / 2)


def test_convert_full_unit_matrix():
    """a.convert(b) follows the reference contract for every ordered pair:
    the unit ratio integer-divides in the safe (larger//smaller) direction
    (reference timedelta.py:100-114) — so e.g. Y.convert('M') is exactly 12
    (365 // 30), not 365/30."""
    import math

    _NANOS = {u: round(_SECS[u] * 1e9) for u in UNITS}
    for a, b in itertools.permutations(UNITS, 2):
        got = TimeDeltaDG(a, 5).convert(TimeDeltaDG(b, 3))
        if _NANOS[a] >= _NANOS[b]:
            want = (5 / 3) * (_NANOS[a] // _NANOS[b])
        else:
            want = (5 / 3) / (_NANOS[b] // _NANOS[a])
        assert got == pytest.approx(want, rel=1e-12), (a, b)
        assert math.isfinite(got) and got > 0


def test_convert_roundtrip_inverse():
    # Exact for unit pairs whose ratio divides evenly (all except the
    # calendar-approximate Y/M/W cross terms, where the reference floors).
    for a, b in itertools.combinations(("D", "h", "m", "s", "ms", "us", "ns"), 2):
        assert TimeDeltaDG(a).convert(b) * TimeDeltaDG(b).convert(a) == pytest.approx(1.0)


def test_coarser_due_to_value():
    # Same unit: the value multiplier decides coarseness.
    assert TimeDeltaDG("s", 61).is_coarser_than(TimeDeltaDG("m", 1))
    assert not TimeDeltaDG("s", 60).is_coarser_than(TimeDeltaDG("m", 1))
    assert TimeDeltaDG("s", 2).is_coarser_than(TimeDeltaDG("s", 1))


def test_coarser_with_event_ordered_raises():
    with pytest.raises(EventOrderedConversionError):
        TimeDeltaDG("r").is_coarser_than("s")
    with pytest.raises(EventOrderedConversionError):
        TimeDeltaDG("s").is_coarser_than(TimeDeltaDG("r"))


def test_value_must_be_plain_int():
    with pytest.raises(ValueError):
        TimeDeltaDG("s", 1.5)
    with pytest.raises(ValueError):
        TimeDeltaDG("s", True)  # bools are ints but not valid multipliers


def test_str_rendering():
    assert str(TimeDeltaDG("s")) == "s"
    assert str(TimeDeltaDG("m", 5)) == "5m"


def test_tgb_tables_complete():
    # Every tgbl/tgbn dataset the reference tabulates is present.
    assert {k for k in TGB_TIME_DELTAS if k.startswith("tgbl-")} == {
        "tgbl-enron", "tgbl-uci", "tgbl-wiki", "tgbl-subreddit", "tgbl-lastfm",
        "tgbl-review", "tgbl-coin", "tgbl-mooc", "tgbl-flight", "tgbl-comment",
    }
    assert TGB_TIME_DELTAS["tkgl-smallpedia"].unit == "Y"
    assert TGB_TIME_DELTAS["tkgl-wikidata"].unit == "Y"
    for name, td in TGB_TIME_DELTAS.items():
        assert td.is_time_ordered, name


def test_tgb_seq_table():
    from tgm_tpu.timedelta import TGB_SEQ_TIME_DELTAS

    for name, td in TGB_SEQ_TIME_DELTAS.items():
        assert isinstance(td, TimeDeltaDG), name
