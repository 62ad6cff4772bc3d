"""G1 — catalog create/info round-trip (reference test/hoard.test.coffee:12-34,
65-83) plus validation behavior."""

import pytest

from hoard_spark.catalog import Catalog, HoardError

LARGE = [(3600, 8760), (86400, 1095)]  # the fixture's "large" policy
SMALL = [(1, 60), (10, 600)]  # README.md:56 example


def test_create_info_roundtrip_large(tmp_path):
    cat = Catalog(str(tmp_path))
    cat.create("m1", LARGE, x_files_factor=0.5)
    info = cat.info("m1")
    assert info.max_retention == 94608000
    assert info.x_files_factor == 0.5
    assert len(info.archives) == 2
    a0, a1 = info.archives
    assert (a0.seconds_per_point, a0.points, a0.retention) == (3600, 8760, 31536000)
    assert (a1.seconds_per_point, a1.points, a1.retention) == (86400, 1095, 94608000)
    # size parity with the binary format (12 B/point, src/hoard.coffee:21-22)
    assert a0.size == 8760 * 12
    assert a1.size == 1095 * 12


def test_archives_sorted_by_precision(tmp_path):
    # create() sorts tiers by ascending secondsPerPoint (src/hoard.coffee:33)
    cat = Catalog(str(tmp_path))
    cat.create("m", [(86400, 1095), (3600, 8760)])
    info = cat.info("m")
    assert [a.seconds_per_point for a in info.archives] == [3600, 86400]


def test_create_existing_rejected(tmp_path):
    # mirrors the EEXIST check (src/hoard.coffee:35-36)
    cat = Catalog(str(tmp_path))
    cat.create("m", SMALL)
    with pytest.raises(HoardError):
        cat.create("m", SMALL)


def test_xff_stored_not_hardcoded(tmp_path):
    # the reference writes 0.5 regardless (bug, src/hoard.coffee:40-46);
    # intended semantics = store the argument (SURVEY.md §5.3)
    cat = Catalog(str(tmp_path))
    cat.create("m", SMALL, x_files_factor=0.25)
    assert cat.info("m").x_files_factor == 0.25


def test_validation_errors(tmp_path):
    cat = Catalog(str(tmp_path))
    with pytest.raises(HoardError):
        cat.create("a", [])
    with pytest.raises(HoardError):
        cat.create("b", [(0, 10)])
    with pytest.raises(HoardError):
        cat.create("c", [(10, 5), (10, 50)])  # duplicate resolution
    with pytest.raises(HoardError):
        cat.create("d", [(7, 100), (10, 100)])  # non-multiple tiers
    with pytest.raises(HoardError):
        cat.create("e", SMALL, x_files_factor=1.5)


def test_persistence_across_instances(tmp_path):
    cat = Catalog(str(tmp_path))
    cat.create("m", LARGE, x_files_factor=0.5)
    cat2 = Catalog(str(tmp_path))
    assert cat2.info("m").max_retention == 94608000
    assert [a.points for a in cat2.info("m").archives] == [8760, 1095]


def test_info_matches_reference_fixture_header():
    """Parse the Python-Whisper-generated fixture header and check our
    derived fields agree with its on-disk values (G1 parity)."""
    import os

    from tests.whisper_fixture import LARGE_WHISPER, read_whisper

    if not os.path.exists(LARGE_WHISPER):
        pytest.skip("reference fixture not available")
    wf = read_whisper()
    assert wf.max_retention == 94608000
    assert wf.x_files_factor == pytest.approx(0.5)
    assert [(a.seconds_per_point, a.points) for a in wf.archives] == [
        (3600, 8760),
        (86400, 1095),
    ]


def test_create_many_one_write_all_or_nothing(tmp_path):
    """Bulk registration (the Whisper-migration path): one catalog save
    for N metrics; a bad entry (duplicate or invalid) admits NOTHING."""
    cat = Catalog(str(tmp_path))
    infos = cat.create_many(
        [(f"m{i}", [(60, 10), (600, 5)], 0.5) for i in range(50)],
        now=1_700_000_000,
    )
    assert len(infos) == 50 and cat.exists("m49")
    # persisted in one shot
    cat2 = Catalog(str(tmp_path))
    assert len(cat2.metrics()) == 50
    # duplicate within the batch -> all-or-nothing
    with pytest.raises(HoardError, match="already exists"):
        cat.create_many([("new1", [(60, 10)], 0.5), ("m0", [(60, 10)], 0.5)])
    assert not cat.exists("new1")
    # invalid archives -> all-or-nothing
    with pytest.raises(HoardError):
        cat.create_many([("new2", [(60, 10)], 0.5), ("new3", [], 0.5)])
    assert not cat.exists("new2")
