"""text2image -> lstmtraining -> lstmeval CLI pipeline (tools.py).

The reference's training loop as its binaries drive it
(src/training/text2image.cpp, lstmtraining.cpp, lstmeval.cpp): render
training pages, fine-tune a damaged model back to exact decode
(--continue_from), convert the checkpoint to a runtime model
(--stop_training), and score it with lstmeval's BCER/BWER verdict —
all through the file-level CLI surface, no library shortcuts.
"""

import numpy as np
import pytest

from tesseract_spark import tools
from tesseract_spark.lstm import training as T
from tesseract_spark.lstm.fixture_model import build_fixture_model
from tesseract_spark.lstm.lstmf import read_lstmf
from tesseract_spark.lstm.tessdata import load_traineddata, save_traineddata

LINES = [
    "the quick brown fox",
    "pack my box with five",
    "dozen liquor jugs now",
    "over the lazy dog",
    "jumps over the pack",
    "five dozen brown jugs",
    "my dog jumps the box",
    "now the fox is lazy",
]


@pytest.fixture()
def text_file(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def _render(tmp_path, text_file, base="corpus", degrade=False):
    args = ["prog", "text2image", "--text", text_file,
            "--outputbase", str(tmp_path / base)]
    if not degrade:
        args += ["--degrade_image=false"]
    assert tools.main(args) == 0
    listfile = tmp_path / f"{base}.list"
    listfile.write_text(str(tmp_path / f"{base}.lstmf") + "\n")
    return str(listfile)


def test_text2image_outputs(tmp_path, text_file, capsys):
    _render(tmp_path, text_file)
    assert "Rendered page 7" in capsys.readouterr().out
    # one PNG page per line + WordStr box file + lstmf package
    for i in range(len(LINES)):
        assert (tmp_path / f"corpus.{i}.png").stat().st_size > 0
    box = (tmp_path / "corpus.box").read_text().splitlines()
    assert len(box) == len(LINES)
    assert box[0].startswith("WordStr ") and box[0].endswith("#" + LINES[0])
    assert int(box[2].split()[5]) == 2  # page number field
    samples = read_lstmf((tmp_path / "corpus.lstmf").read_bytes())
    assert [s.transcription for s in samples] == LINES


def test_text2image_degraded_differs(tmp_path, text_file):
    _render(tmp_path, text_file, base="clean")
    _render(tmp_path, text_file, base="deg", degrade=True)
    clean = read_lstmf((tmp_path / "clean.lstmf").read_bytes())
    deg = read_lstmf((tmp_path / "deg.lstmf").read_bytes())
    assert [s.transcription for s in deg] == LINES
    assert any(c.image_png != d.image_png for c, d in zip(clean, deg))


def test_text2image_distort_image(tmp_path, text_file):
    """--distort_image (text2image.cpp:645-649): PrepareDistortedPix runs
    after degradation, deterministic, transcription-preserving."""
    _render(tmp_path, text_file, base="clean")
    args = ["prog", "text2image", "--text", text_file,
            "--outputbase", str(tmp_path / "dist"),
            "--degrade_image=false", "--distort_image"]
    assert tools.main(args) == 0
    assert tools.main(["prog", "text2image", "--text", text_file,
                       "--outputbase", str(tmp_path / "dist2"),
                       "--degrade_image=false", "--distort_image"]) == 0
    clean = read_lstmf((tmp_path / "clean.lstmf").read_bytes())
    dist = read_lstmf((tmp_path / "dist.lstmf").read_bytes())
    dist2 = read_lstmf((tmp_path / "dist2.lstmf").read_bytes())
    assert [s.transcription for s in dist] == LINES
    assert any(c.image_png != d.image_png for c, d in zip(clean, dist))
    assert all(a.image_png == b.image_png for a, b in zip(dist, dist2))


def test_train_convert_eval_pipeline(tmp_path, text_file, capsys):
    listfile = _render(tmp_path, text_file)

    # damage the output layer of the fixture model -> broken decode
    model = build_fixture_model()
    out_idx = len(model.net.layers) - 1
    slots = T.trainable_slots(model.net, (out_idx,))
    vec = T.flatten(model.net, slots)
    rng = np.random.default_rng(7)
    T.unflatten(model.net, slots,
                (vec + rng.normal(0, 1.5, vec.shape)).astype(np.float32))
    damaged = tmp_path / "damaged.traineddata"
    damaged.write_bytes(save_traineddata(model))

    # damaged model really is broken: lstmeval reports a high BCER
    assert tools.main([
        "prog", "lstmeval", "--model", str(damaged),
        "--eval_listfile", listfile, "--verbosity", "0"]) == 0
    bad = capsys.readouterr().out.strip().splitlines()[-1]
    assert bad.startswith("BCER eval=")
    assert float(bad.split("=")[1].split(",")[0]) > 20.0

    # lstmtraining --continue_from recovers exact decode on the corpus
    assert tools.main([
        "prog", "lstmtraining",
        "--continue_from", str(damaged),
        "--train_listfile", listfile,
        "--model_output", str(tmp_path / "tuned"),
        "--append_index", str(out_idx),
        "--learning_rate", "0.05",
        "--max_iterations", "200"]) == 0
    out = capsys.readouterr().out
    assert "At iteration 1," in out and "Saved checkpoint" in out
    last = [ln for ln in out.splitlines() if ln.startswith("At iteration")][-1]
    assert "char train=0.000%" in last
    ckpt = tmp_path / "tuned_checkpoint"
    assert ckpt.stat().st_size > 0

    # --stop_training converts the checkpoint to a runtime traineddata
    assert tools.main([
        "prog", "lstmtraining", "--stop_training",
        "--model_output", str(tmp_path / "tuned")]) == 0
    runtime = tmp_path / "tuned.traineddata"
    assert runtime.stat().st_size > 0
    load_traineddata(runtime.read_bytes())  # container is well-formed

    # lstmeval on the runtime model: perfect verdict, reference wording
    assert tools.main([
        "prog", "lstmeval", "--model", str(runtime),
        "--eval_listfile", listfile]) == 0
    out = capsys.readouterr().out
    assert out.strip().splitlines()[-1] == "BCER eval=0.000, BWER eval=0.000"
    assert "Truth:" not in out  # verbosity 1 prints imperfect lines only

    # verbosity 2 prints every Truth/OCR pair (lstmtester.cpp:102-109)
    assert tools.main([
        "prog", "lstmeval", "--model", str(runtime),
        "--eval_listfile", listfile, "--verbosity", "2"]) == 0
    out = capsys.readouterr().out
    assert out.count("Truth:") == len(LINES)
    assert f"OCR  :{LINES[0]}" in out


def test_lstmtraining_requires_inputs(capsys):
    # bare argv hits the reference's print-usage-and-exit(0) path
    # (commandlineflags.cpp argc==1); a flagged call without the
    # required inputs is the hard error
    assert tools.main(
        ["prog", "lstmtraining", "--max_iterations", "5"]) == 1
    assert "required" in capsys.readouterr().err


def test_lstmeval_requires_inputs(capsys):
    assert tools.main(["prog", "lstmeval", "--verbosity", "0"]) == 1
    assert "required" in capsys.readouterr().err


def test_from_scratch_net_spec_pipeline(tmp_path, capsys):
    """The full tesstrain FROM-SCRATCH loop through argv only
    (lstmtraining.cpp:171-187 InitNetwork branch): render ->
    unicharset_extractor -> combine_lang_model (starter, no net) ->
    lstmtraining --net_spec (NetworkBuilder random init) to exact
    decode -> --stop_training convert -> lstmeval BCER 0."""
    text_file = tmp_path / "scratch.txt"
    text_file.write_text("ab ba\naab\nbba ab\nabab\n")
    base = str(tmp_path / "scr")
    assert tools.main(["prog", "text2image", "--text", str(text_file),
                       "--outputbase", base, "--degrade_image=false"]) == 0
    listfile = tmp_path / "scr.list"
    listfile.write_text(base + ".lstmf\n")

    ucs_out = str(tmp_path / "scratch.unicharset")
    assert tools.main(["prog", "unicharset_extractor",
                       "--output_unicharset", ucs_out,
                       str(text_file)]) == 0
    assert tools.main(["prog", "combine_lang_model",
                       "--input_unicharset", ucs_out,
                       "--lang", "scr", "--output_dir", str(tmp_path),
                       "--words", str(text_file)]) == 0
    starter = str(tmp_path / "scr" / "scr.traineddata")
    # a starter has no net: the runtime loader must reject it
    from tesseract_spark.lstm.tessdata import load_traineddata
    with pytest.raises(Exception):
        load_traineddata(open(starter, "rb").read())

    model_out = str(tmp_path / "scratchnet")
    assert tools.main([
        "prog", "lstmtraining", "--net_spec",
        "[1,1,0,16 Ct1,5,24 Lbx32 O1c9]",
        "--traineddata", starter, "--train_listfile", str(listfile),
        "--eval_listfile", str(listfile),
        "--model_output", model_out, "--learning_rate", "0.02",
        "--max_iterations", "300"]) == 0
    out = capsys.readouterr().out
    # ParseOutput's class-count substitution + the InitNetwork banner
    assert "not equal to unicharset of 4" in out
    assert "Built network:[1,1,0,16 Ct1,5,24 Lbx32 O1c4]" in out
    assert "char train=0.000%" in out  # reached exact decode
    # the LSTMTester verdict line (lstmtester.cpp:122-126 wording)
    assert ", stage 0, BCER eval=0.000, BWER eval=0.000" in out

    assert tools.main(["prog", "lstmtraining", "--stop_training",
                       "--model_output", model_out]) == 0
    assert tools.main(["prog", "lstmeval",
                       "--model", model_out + ".traineddata",
                       "--eval_listfile", str(listfile)]) == 0
    assert "BCER eval=0.000" in capsys.readouterr().out
