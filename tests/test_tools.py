"""Training-tool CLIs (tesseract_spark/tools.py) — file-level
round-trips mirroring the reference binaries' contracts."""

import pytest

from tesseract_spark import tools
from tesseract_spark.lstm.tessdata import Unicharset


@pytest.fixture()
def uc_file(tmp_path):
    uc = Unicharset.from_texts(["the cat sat on a mat dog"])
    p = tmp_path / "eng.unicharset"
    p.write_bytes(uc.save())
    return str(p)


def test_wordlist2dawg_roundtrip(tmp_path, uc_file):
    words = ["cat", "dog", "mat", "sat", "the"]
    wl = tmp_path / "words.txt"
    wl.write_text("\n".join(words) + "\n")
    dawg = tmp_path / "eng.dawg"
    assert tools.main(
        ["prog", "wordlist2dawg", str(wl), str(dawg), uc_file]) == 0
    assert dawg.stat().st_size > 0

    out = tmp_path / "back.txt"
    assert tools.main(
        ["prog", "dawg2wordlist", uc_file, str(dawg), str(out)]) == 0
    assert sorted(out.read_text().split()) == sorted(words)


def test_wordlist2dawg_usage_error(capsys):
    assert tools.main_wordlist2dawg(["wordlist2dawg", "only_one"]) == 1
    assert "Usage:" in capsys.readouterr().err


def test_unicharset_extractor_flags(tmp_path, capsys):
    t1 = tmp_path / "a.txt"
    t2 = tmp_path / "b.txt"
    t1.write_text("hello world")
    t2.write_text("zebra quiz")
    out = tmp_path / "out.unicharset"
    rc = tools.main([
        "prog", "unicharset_extractor",
        "--output_unicharset", str(out), "--norm_mode", "2",
        str(t1), str(t2)])
    assert rc == 0
    assert "Wrote unicharset file" in capsys.readouterr().out
    uc = Unicharset.load(out.read_bytes())
    for ch in "helowrdzbaqui":
        assert ch in uc.chars


def test_unicharset_extractor_no_inputs(tmp_path, capsys):
    assert tools.main(["prog", "unicharset_extractor",
                       "--output_unicharset", str(tmp_path / "x")]) == 1


def test_merge_unicharsets(tmp_path):
    a = tmp_path / "a.unicharset"
    b = tmp_path / "b.unicharset"
    a.write_bytes(Unicharset.from_texts(["abc"]).save())
    b.write_bytes(Unicharset.from_texts(["xyz"]).save())
    out = tmp_path / "m.unicharset"
    assert tools.main(
        ["prog", "merge_unicharsets", str(a), str(b), str(out)]) == 0
    uc = Unicharset.load(out.read_bytes())
    for ch in "abcxyz":
        assert ch in uc.chars


def test_combine_tessdata_pack_list_extract_unpack(tmp_path, capsys):
    prefix = str(tmp_path / "eng.")
    (tmp_path / "eng.unicharset").write_bytes(
        Unicharset.from_texts(["abc"]).save())
    (tmp_path / "eng.version").write_bytes(b"5.5.3-spark-test")

    # pack
    assert tools.main(["prog", "combine_tessdata", prefix]) == 0
    td = tmp_path / "eng.traineddata"
    assert td.exists()

    # list
    assert tools.main(["prog", "combine_tessdata", "-d", str(td)]) == 0
    listed = capsys.readouterr().out
    assert "unicharset:size=" in listed and "version:size=" in listed

    # extract one section
    out_v = tmp_path / "out.version"
    assert tools.main(
        ["prog", "combine_tessdata", "-e", str(td), str(out_v)]) == 0
    assert out_v.read_bytes() == b"5.5.3-spark-test"

    # unpack everything; components byte-equal the originals
    assert tools.main(
        ["prog", "combine_tessdata", "-u", str(td),
         str(tmp_path / "un.")]) == 0
    assert (tmp_path / "un.unicharset").read_bytes() == (
        tmp_path / "eng.unicharset").read_bytes()
    assert (tmp_path / "un.version").read_bytes() == b"5.5.3-spark-test"


def test_combine_tessdata_extract_missing_section(tmp_path, capsys):
    (tmp_path / "x.unicharset").write_bytes(
        Unicharset.from_texts(["a"]).save())
    assert tools.main(
        ["prog", "combine_tessdata", str(tmp_path / "x.")]) == 0
    td = str(tmp_path / "x.traineddata")
    assert tools.main(
        ["prog", "combine_tessdata", "-e", td,
         str(tmp_path / "x.lstm")]) == 1


def test_dispatcher_unknown_tool(capsys):
    assert tools.main(["prog", "nosuchtool"]) == 1
    assert "Usage:" in capsys.readouterr().err


def test_full_traineddata_survives_tools(tmp_path):
    # a real engine traineddata through -u then re-pack: the container
    # round-trips section-exact and still loads
    from tesseract_spark.lstm.fixture_model import fixture_traineddata_bytes

    blob = fixture_traineddata_bytes()
    td = tmp_path / "eng.traineddata"
    td.write_bytes(blob)
    assert tools.main(
        ["prog", "combine_tessdata", "-u", str(td),
         str(tmp_path / "eng.")]) == 0
    assert tools.main(
        ["prog", "combine_tessdata", str(tmp_path / "eng.")]) == 0
    from tesseract_spark.lstm.tessdata import load_traineddata

    load_traineddata((tmp_path / "eng.traineddata").read_bytes())
