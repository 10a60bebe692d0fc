"""STATUS log level + data-server download machinery
(NuRadioReco/utilities/{logging,dataservers}.py equivalents; downloads are
exercised against file:// servers — no network)."""
import logging
import os
import tarfile

import pytest

from nuradiomc_tpu.utils import dataservers
from nuradiomc_tpu.utils.logging import LOGGING_STATUS, setup_logger


def test_status_level(caplog):
    logger = setup_logger("nrt_test_status", level=LOGGING_STATUS)
    assert logging.getLevelName(LOGGING_STATUS) == "STATUS"
    with caplog.at_level(LOGGING_STATUS, logger="nrt_test_status"):
        logger.status("production %d%% done", 50)
        logger.info("hidden at STATUS level")
    msgs = [r for r in caplog.records if r.name == "nrt_test_status"]
    assert len(msgs) == 1
    assert msgs[0].levelname == "STATUS"
    assert "production 50% done" in msgs[0].message


def test_download_with_hash(tmp_path):
    server = tmp_path / "server"
    server.mkdir()
    payload = b"antenna pickle bytes" * 100
    (server / "AntennaModels").mkdir()
    (server / "AntennaModels" / "m.pkl").write_bytes(payload)

    target = str(tmp_path / "local" / "m.pkl")
    got = dataservers.download_from_dataserver(
        "AntennaModels/m.pkl", target,
        dataservers=[f"file://{server}"])
    assert open(got, "rb").read() == payload
    digest = dataservers.sha1_of(got)

    # valid existing file short-circuits (no re-download even if the
    # server disappears)
    got2 = dataservers.download_from_dataserver(
        "AntennaModels/m.pkl", target,
        dataservers=["file:///nonexistent"], expected_sha1=digest)
    assert got2 == target

    # corrupted file with a hash mismatch is re-downloaded
    with open(target, "ab") as f:
        f.write(b"corruption")
    got3 = dataservers.download_from_dataserver(
        "AntennaModels/m.pkl", target,
        dataservers=[f"file://{server}"], expected_sha1=digest)
    assert dataservers.sha1_of(got3) == digest

    # bad digest from the server itself is an error
    (server / "AntennaModels" / "m.pkl").write_bytes(b"changed on server")
    os.remove(target)
    with pytest.raises(IOError):
        dataservers.download_from_dataserver(
            "AntennaModels/m.pkl", target,
            dataservers=[f"file://{server}"], expected_sha1=digest)


def test_download_fallback_and_tarball(tmp_path):
    dead = tmp_path / "dead"
    live = tmp_path / "live"
    live.mkdir()
    inner = tmp_path / "payload.dat"
    inner.write_bytes(b"x" * 64)
    with tarfile.open(live / "lib.tar.gz", "w:gz") as t:
        t.add(inner, arcname="payload.dat")

    target = str(tmp_path / "out" / "lib.tar.gz")
    dataservers.download_from_dataserver(
        "lib.tar.gz", target,
        dataservers=[f"file://{dead}", f"file://{live}"])
    # tarball unpacked and removed (dataservers.py:90-96)
    assert not os.path.exists(target)
    assert open(os.path.join(os.path.dirname(target), "payload.dat"),
                "rb").read() == b"x" * 64

    with pytest.raises(IOError):
        dataservers.download_from_dataserver(
            "missing.bin", str(tmp_path / "nope.bin"),
            dataservers=[f"file://{dead}"])
