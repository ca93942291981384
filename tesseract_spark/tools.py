"""Training-tool command-line programs.

The reference ships its training utilities as standalone binaries
driven by ParseCommandLineFlags; this module is the same toolbox over
one dispatcher:

    python -m tesseract_spark.tools TOOL [args...]

Tools (usage mirrors the reference program of the same name):

- ``wordlist2dawg word_list_file dawg_file unicharset_file``
  (src/training/wordlist2dawg.cpp:34-95)
- ``dawg2wordlist unicharset_file dawg_file wordlist_file``
  (src/training/dawg2wordlist.cpp:23-60)
- ``unicharset_extractor [--output_unicharset filename]
  [--norm_mode mode] text_files...``
  (src/training/unicharset_extractor.cpp:35-115; flags parsed by the
  ported ParseCommandLineFlags in flags.py)
- ``merge_unicharsets unicharset-in-1 ... unicharset-in-n out``
  (src/training/merge_unicharsets.cpp)
- ``combine_tessdata prefix.`` | ``-e traineddata file...`` |
  ``-u traineddata prefix`` | ``-d traineddata``
  (src/training/combine_tessdata.cpp:125-260)
- ``text2image --text file --outputbase base [--degrade_image]
  [--exposure n]`` (src/training/text2image.cpp:62-120 subset)
- ``lstmtraining --continue_from model --train_listfile f
  --model_output base [--append_index n] [--learning_rate r]
  [--max_iterations n] [--target_error_rate e] | --stop_training``
  (src/training/lstmtraining.cpp:33-66 subset)
- ``lstmeval --model m --eval_listfile f [--verbosity n]``
  (src/training/lstmeval.cpp:24-80)

Each ``main_*`` takes argv (program name at index 0) and returns an
exit code, so tests drive them exactly as a shell would.
"""

from __future__ import annotations

import os
import sys

# kTessdataFileSuffixes (src/ccutil/tessdatamanager.h:30-86) — the
# subset whose sections this engine reads/writes
SUFFIX_TO_TYPE = {
    "config": 0,
    "unicharset": 1,
    "lstm": 17,
    "lstm-punc-dawg": 18,
    "lstm-word-dawg": 19,
    "lstm-number-dawg": 20,
    "lstm-unicharset": 21,
    "lstm-recoder": 22,
    "version": 23,
}
TYPE_TO_SUFFIX = {v: k for k, v in SUFFIX_TO_TYPE.items()}


def _read_unicharset(path: str):
    from .lstm.tessdata import Unicharset

    with open(path, "rb") as f:
        return Unicharset.load(f.read())


def main_wordlist2dawg(argv: list[str]) -> int:
    if len(argv) != 4:
        print(f"Usage: {argv[0]} word_list_file dawg_file unicharset_file",
              file=sys.stderr)
        return 1
    from .lstm.dawg import wordlist2dawg

    uc = _read_unicharset(argv[3])
    with open(argv[1], "r", encoding="utf-8") as f:
        words = [w.strip() for w in f if w.strip()]
    charset = "".join(uc.chars)
    with open(argv[2], "wb") as f:
        f.write(wordlist2dawg(words, charset))
    return 0


def main_dawg2wordlist(argv: list[str]) -> int:
    if len(argv) != 4:
        print(f"Usage: {argv[0]} unicharset_file dawg_file wordlist_file",
              file=sys.stderr)
        return 1
    from .lstm.dawg import dawg2wordlist

    uc = _read_unicharset(argv[1])
    with open(argv[2], "rb") as f:
        data = f.read()
    words = dawg2wordlist(data, "".join(uc.chars))
    with open(argv[3], "w", encoding="utf-8") as f:
        for w in words:
            f.write(w + "\n")
    return 0


def main_unicharset_extractor(argv: list[str]) -> int:
    """Text files in, unicharset out — one distributed hash aggregation
    at corpus scale (Unicharset.from_texts / queries.charset_extract);
    here the local file-driven shape.  norm_mode is accepted for
    usage-compatibility; this engine's charset ingest normalizes per
    grapheme always (mode 1 semantics)."""
    from .flags import FlagRegistry, parse_command_line_flags
    from .lstm.tessdata import Unicharset

    reg = FlagRegistry()
    reg.string_flag("output_unicharset", "unicharset", "Output file path")
    reg.int_flag("norm_mode", 1,
                 "Normalization mode for the input strings")
    rest = parse_command_line_flags(
        f"{argv[0]} [--output_unicharset filename] [--norm_mode mode] "
        "text_files...",
        argv, remove_flags=True, registry=reg)
    if len(rest) < 2:
        print("Error: no input files", file=sys.stderr)
        return 1
    texts = []
    for path in rest[1:]:
        with open(path, "r", encoding="utf-8") as f:
            texts.append(f.read())
    uc = Unicharset.from_texts(texts)
    out = reg.get("output_unicharset").value
    with open(out, "wb") as f:
        f.write(uc.save())
    print(f"Wrote unicharset file {out}")
    return 0


def main_merge_unicharsets(argv: list[str]) -> int:
    if len(argv) < 4:
        print(f"Usage: {argv[0]} unicharset-in-1 ... unicharset-in-n "
              "unicharset-out", file=sys.stderr)
        return 1
    from .lstm.tessdata import merge_unicharsets

    merged = _read_unicharset(argv[1])
    for path in argv[2:-1]:
        merged = merge_unicharsets(merged, _read_unicharset(path))
    with open(argv[-1], "wb") as f:
        f.write(merged.save())
    return 0


def main_combine_lang_model(argv: list[str]) -> int:
    """combine_lang_model (src/training/combine_lang_model.cpp:30-80):
    package a STARTER traineddata — unicharset + recoder + optional
    word/punc/number dawgs, no network — under
    ``output_dir/lang/lang.traineddata`` (the reference's output
    layout), ready for ``lstmtraining --net_spec`` to attach a net.
    The engine's recoder is always the pass-through
    (--pass_through_recoder accepted for usage parity)."""
    from .flags import FlagRegistry, parse_command_line_flags
    from .lstm.tessdata import combine_lang_model

    reg = FlagRegistry()
    reg.string_flag("input_unicharset", "",
                    "Unicharset to complete and use in encoding")
    reg.string_flag("words", "",
                    "File listing words to use for the system dictionary")
    reg.string_flag("puncs", "", "File listing punctuation patterns")
    reg.string_flag("numbers", "", "File listing number patterns")
    reg.string_flag("output_dir", "", "Root directory for output files")
    reg.string_flag("version_str", "5.5.3-spark",
                    "Version string to add to traineddata file")
    reg.string_flag("lang", "", "Name of language being processed")
    reg.bool_flag("lang_is_rtl", False,
                  "True if lang being processed is written right-to-left")
    reg.bool_flag("pass_through_recoder", False,
                  "If true, the recoder is a simple pass-through of the "
                  "unicharset.")
    parse_command_line_flags(
        f"{argv[0]} --input_unicharset u --lang l --output_dir d "
        "[--words w] [--puncs p] [--numbers n]",
        argv, remove_flags=True, registry=reg)
    ucs_path = reg.get("input_unicharset").value
    lang = reg.get("lang").value
    out_dir = reg.get("output_dir").value
    if not ucs_path or not lang or not out_dir:
        print("Error: --input_unicharset, --lang and --output_dir are "
              "required", file=sys.stderr)
        return 1
    ucs = _read_unicharset(ucs_path)

    def wordlist(flag):
        path = reg.get(flag).value
        if not path:
            return None
        with open(path, "r", encoding="utf-8") as f:
            return [w.strip() for w in f if w.strip()]

    blob = combine_lang_model(
        ucs,
        words=wordlist("words"),
        puncs=wordlist("puncs"),
        numbers=wordlist("numbers"),
        version=reg.get("version_str").value,
    )
    lang_dir = os.path.join(out_dir, lang)
    os.makedirs(lang_dir, exist_ok=True)
    out = os.path.join(lang_dir, f"{lang}.traineddata")
    with open(out, "wb") as f:
        f.write(blob)
    # human-readability sidecars the reference writes
    with open(os.path.join(lang_dir, f"{lang}.unicharset"), "wb") as f:
        f.write(ucs.save())
    print(f"Wrote {out}")
    return 0


def main_combine_tessdata(argv: list[str]) -> int:
    from .lstm.tessdata import read_container, write_container

    if len(argv) >= 3 and argv[1] == "-e":
        # extract: each output filename's suffix names the section
        with open(argv[2], "rb") as f:
            entries = read_container(f.read())
        for out in argv[3:]:
            suffix = out.split(".")[-1]
            t = SUFFIX_TO_TYPE.get(suffix)
            if t is None or t not in entries:
                print(f"Not extracting {out}: no such section", file=sys.stderr)
                return 1
            with open(out, "wb") as f:
                f.write(entries[t])
        return 0
    if len(argv) == 4 and argv[1] == "-u":
        with open(argv[2], "rb") as f:
            entries = read_container(f.read())
        for t, blob in sorted(entries.items()):
            suffix = TYPE_TO_SUFFIX.get(t, str(t))
            with open(f"{argv[3]}{suffix}", "wb") as f:
                f.write(blob)
        return 0
    if len(argv) == 3 and argv[1] == "-d":
        with open(argv[2], "rb") as f:
            entries = read_container(f.read())
        for t, blob in sorted(entries.items()):
            print(f"{TYPE_TO_SUFFIX.get(t, t)}:size={len(blob)}")
        return 0
    if len(argv) == 2:
        # combine: prefix. + known suffixes -> prefix.traineddata
        prefix = argv[1]
        entries = {}
        for suffix, t in SUFFIX_TO_TYPE.items():
            path = prefix + suffix
            if os.path.exists(path):
                with open(path, "rb") as f:
                    entries[t] = f.read()
        if not entries:
            print(f"Error: no input components found at {prefix}*",
                  file=sys.stderr)
            return 1
        out = prefix.rstrip(".") + ".traineddata"
        with open(out, "wb") as f:
            f.write(write_container(entries))
        print(f"Output {out} created successfully.")
        return 0
    print(
        f"Usage: {argv[0]} language_data_path_prefix. | "
        f"-e traineddata file... | -u traineddata prefix | -d traineddata",
        file=sys.stderr)
    return 1


def _read_lstmf_listfile(listfile: str):
    """A *_listfile flag names a file of .lstmf paths, one per line
    (lstmtraining.cpp:47-49); every sample from every file, in order."""
    from .lstm.lstmf import read_lstmf

    samples = []
    with open(listfile, "r", encoding="utf-8") as f:
        paths = [ln.strip() for ln in f if ln.strip()]
    for path in paths:
        with open(path, "rb") as f:
            samples.extend(read_lstmf(f.read()))
    return samples


def _samples_to_strips(samples):
    """Carried sample PNGs -> bool ink strips at the fixed threshold 128
    — the same binarization the trainer's image path applies
    (training.distributed_gradient), so CLI train/eval and the Spark
    path see identical tensors."""
    from .functions.png_codec import decode_gray_png

    return [decode_gray_png(s.image_png) < 128 for s in samples]


def main_text2image(argv: list[str]) -> int:
    """text2image (src/training/text2image.cpp:62-120 flag surface,
    subset): render each line of --text with the fixture font into
    training pages.

    Outputs (reference: outputbase.tif + outputbase.box; this engine's
    raster is one PNG per line page and its training interchange is the
    .lstmf container, so both are written):

    - ``outputbase.<page>.png``  one rendered line per page
    - ``outputbase.box``         WordStr-style box lines
      (``WordStr l b r t page #text`` — the LSTM training box format)
    - ``outputbase.lstmf``       the packaged ImageData samples that
      lstmtraining/lstmeval consume directly

    --degrade_image/--exposure apply the print/copy/scan degradation
    (degradeimage.cpp via lstm/degrade.py) exactly as the reference
    does before writing.
    """
    from .flags import FlagRegistry, parse_command_line_flags
    from .lstm.lstmf import make_line_samples, write_lstmf

    reg = FlagRegistry()
    reg.string_flag("text", "", "File name of text input to process")
    reg.string_flag("outputbase", "", "Basename for output image/box file (boxchar.cpp box records)")
    reg.bool_flag("degrade_image", True,
                  "Degrade rendered image with ink spread and noise")
    reg.int_flag("exposure", 0, "Exposure level in photocopier")
    # the --distort_image family, text2image.cpp:79-95 defaults
    reg.bool_flag("distort_image", False,
                  "Degrade rendered image with noise, blur, invert.")
    reg.bool_flag("invert", True, "Invert the image")
    reg.bool_flag("white_noise", True, "Add  Gaussian Noise")
    reg.bool_flag("smooth_noise", True, "Smoothen Noise")
    reg.bool_flag("blur", True, "Blur the image")
    parse_command_line_flags(
        f"{argv[0]} --text file --outputbase base [--degrade_image] "
        "[--exposure n] [--distort_image]", argv, remove_flags=True,
        registry=reg)
    text_file = reg.get("text").value
    outputbase = reg.get("outputbase").value
    if not text_file or not outputbase:
        print("Error: --text and --outputbase are required", file=sys.stderr)
        return 1
    with open(text_file, "r", encoding="utf-8") as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    if not lines:
        print(f"Error: no text lines in {text_file}", file=sys.stderr)
        return 1
    exposure = (reg.get("exposure").value
                if reg.get("degrade_image").value else None)
    # PrepareDistortedPix call shape, text2image.cpp:645-649: the
    # reference passes perspective=false (its own TODO) — matched here.
    distort = None
    if reg.get("distort_image").value:
        distort = {
            "perspective": False,
            "invert": reg.get("invert").value,
            "white_noise": reg.get("white_noise").value,
            "smooth_noise": reg.get("smooth_noise").value,
            "blur": reg.get("blur").value,
        }
    samples = make_line_samples(
        lines, name=os.path.basename(outputbase), degrade_exposure=exposure,
        distort=distort,
    )
    box_lines = []
    for page, s in enumerate(samples):
        with open(f"{outputbase}.{page}.png", "wb") as f:
            f.write(s.image_png)
        for (bl_x, bl_y, tr_x, tr_y), t in zip(s.boxes, s.box_texts):
            box_lines.append(
                f"WordStr {bl_x} {bl_y} {tr_x} {tr_y} {page} #{t}"
            )
    with open(f"{outputbase}.box", "w", encoding="utf-8") as f:
        f.write("\n".join(box_lines) + "\n")
    with open(f"{outputbase}.lstmf", "wb") as f:
        f.write(write_lstmf(samples))
    print(f"Rendered page {len(samples) - 1} to {outputbase}.lstmf")
    return 0


def main_lstmtraining(argv: list[str]) -> int:
    """lstmtraining (src/training/lstmtraining.cpp:33-66 flag surface):
    fine-tune via --continue_from, or train FROM SCRATCH via --net_spec
    + --traineddata (a combine_lang_model starter container), the
    reference's initializing-from-scratch branch
    (lstmtraining.cpp:171-187 -> LSTMTrainer::InitNetwork ->
    NetworkBuilder, here tessdata.build_model_from_spec).

    Flow mirrors the reference main (lstmtraining.cpp:108-170):
    training writes ``<model_output>_checkpoint`` (here: a full
    traineddata container — the engine's checkpoint format);
    ``--stop_training`` converts an existing checkpoint to
    ``<model_output>.traineddata`` (FinishTraining path).

    Divergences, both documented in lstm/training.py: iterations are
    full-batch Adam steps (the distributed gradient shape), not the
    reference's per-line sequential updates; --append_index freezes the
    layers below the index rather than re-initializing above it.
    """
    from .flags import FlagRegistry, parse_command_line_flags
    from .lstm import training as T
    from .lstm.eval import _error_counts
    from .lstm.fixture_model import decode_strips
    from .lstm.tessdata import load_traineddata, save_traineddata

    reg = FlagRegistry()
    reg.string_flag("continue_from", "", "Existing model to extend")
    reg.string_flag("net_spec", "", "Network specification")
    reg.string_flag("model_output", "lstmtrain",
                    "Basename for output models")
    reg.string_flag("traineddata", "",
                    "Combined Dawgs/Unicharset/Recoder for language model")
    reg.string_flag("train_listfile", "",
                    "File listing training files in lstmf training format.")
    reg.string_flag("eval_listfile", "",
                    "File listing eval files in lstmf training format.")
    reg.int_flag("max_iterations", 0, "If set, exit after this many iterations")
    reg.double_flag("learning_rate", 10.0e-4, "Weight factor for new deltas.")
    reg.double_flag("target_error_rate", 0.01, "Final error rate in percent.")
    reg.int_flag("append_index", -1,
                 "Index in continue_from Network at which to freeze below")
    reg.bool_flag("convert_to_int", False,
                  "Convert the recognition model to an integer model.")
    reg.bool_flag("stop_training", False,
                  "Just convert the training model to a runtime model.")
    parse_command_line_flags(
        f"{argv[0]} --continue_from model --train_listfile f "
        "--model_output base [flags...]",
        argv, remove_flags=True, registry=reg)

    model_output = reg.get("model_output").value
    checkpoint = model_output + "_checkpoint"

    if reg.get("stop_training").value:
        # FinishTraining: checkpoint (or --continue_from) -> runtime model
        src = checkpoint if os.path.exists(checkpoint) else \
            reg.get("continue_from").value
        if not src or not os.path.exists(src):
            print(f"Failed to read continue from: {checkpoint}",
                  file=sys.stderr)
            return 1
        with open(src, "rb") as f:
            model = load_traineddata(f.read())
        out = model_output + ".traineddata"
        with open(out, "wb") as f:
            f.write(save_traineddata(
                model, int_mode=reg.get("convert_to_int").value))
        print(f"Converted checkpoint to recognition model {out}")
        return 0

    cont = reg.get("continue_from").value
    net_spec = reg.get("net_spec").value
    listfile = reg.get("train_listfile").value
    if not listfile or not (cont or net_spec):
        print("Error: --train_listfile plus either --continue_from "
              "(fine-tune) or --net_spec with --traineddata "
              "(from scratch) is required", file=sys.stderr)
        return 1
    if cont:
        with open(cont, "rb") as f:
            model = load_traineddata(f.read())
        if reg.get("traineddata").value:
            # language-model container: take its charset-side sections
            with open(reg.get("traineddata").value, "rb") as f:
                lang = load_traineddata(f.read())
            for attr in ("word_dawg", "number_dawg", "punc_dawg"):
                if getattr(lang, attr) is not None:
                    setattr(model, attr, getattr(lang, attr))
    else:
        # initializing from scratch (lstmtraining.cpp:171-187): the
        # starter traineddata supplies charset/recoder/dawgs, the spec
        # builds the randomly-initialized net (NetworkBuilder)
        if not reg.get("traineddata").value:
            print("Must specify --traineddata to init network!",
                  file=sys.stderr)
            return 1
        from .lstm.tessdata import build_model_from_spec

        with open(reg.get("traineddata").value, "rb") as f:
            model = build_model_from_spec(net_spec, f.read())
        print(f"Built network:{model.spec} from request {net_spec}")

    samples = _read_lstmf_listfile(listfile)
    if not samples:
        print(f"Error: no samples in {listfile}", file=sys.stderr)
        return 1
    strips = _samples_to_strips(samples)
    texts = [s.transcription for s in samples]
    charset, blank = model.charset, model.null_char

    append_index = reg.get("append_index").value
    layers = (tuple(range(append_index, len(model.net.layers)))
              if append_index >= 0 else None)
    slots = T.trainable_slots(model.net, layers)
    vec = T.flatten(model.net, slots)
    adam = T.Adam(len(vec), lr=reg.get("learning_rate").value)
    max_iter = reg.get("max_iterations").value or 300
    target = reg.get("target_error_rate").value
    for it in range(1, max_iter + 1):
        g, loss, n, n_exact = T.batch_gradients(
            model.net, slots, texts, charset, blank, strips=strips
        )
        ce, nc, we, nw, _ex = _error_counts(
            texts, decode_strips(model, strips)
        )
        bcer = 100.0 * ce / max(1, nc)
        bwer = 100.0 * we / max(1, nw)
        print(f"At iteration {it}, Mean rms={loss / max(n, 1):.3f}, "
              f"char train={bcer:.3f}%, word train={bwer:.3f}%")
        if n_exact == n or bcer <= target:
            break
        vec = adam.step(vec, g / max(n, 1))
        T.unflatten(model.net, slots, vec)
    if reg.get("eval_listfile").value:
        # the LSTMTester held-out eval (lstmtester.cpp:80-127 RunEvalSync
        # verdict line, threaded through lstmtraining.cpp:200-207)
        eval_samples = _read_lstmf_listfile(reg.get("eval_listfile").value)
        if eval_samples:
            truths = [s.transcription for s in eval_samples]
            preds = decode_strips(model, _samples_to_strips(eval_samples))
            ce, nc, we, nw, _ex = _error_counts(truths, preds)
            print(f"At iteration {it}, stage 0, "
                  f"BCER eval={100.0 * ce / max(1, nc):.3f}, "
                  f"BWER eval={100.0 * we / max(1, nw):.3f}")
    with open(checkpoint, "wb") as f:
        f.write(save_traineddata(model))
    print(f"Saved checkpoint {checkpoint}")
    return 0


def main_lstmeval(argv: list[str]) -> int:
    """lstmeval (src/training/lstmeval.cpp:24-80): --model over
    --eval_listfile, reporting the LSTMTester verdict line
    (lstmtester.cpp:118-127 ``BCER eval=..., BWER eval=...``; verbosity
    >0 prints Truth/OCR for imperfect lines, >1 for all, as
    lstmtester.cpp:95-115 does).

    The cluster-scale version of this tool is
    lstm/eval.distributed_eval (one partial-counts row per partition);
    this CLI is the reference binary's single-process file-driven shape
    over the SAME decode helpers.
    """
    from .flags import FlagRegistry, parse_command_line_flags
    from .lstm.eval import _error_counts
    from .lstm.fixture_model import decode_strips
    from .lstm.tessdata import load_traineddata

    reg = FlagRegistry()
    reg.string_flag("model", "",
                    "Name of model file (training or recognition)")
    reg.string_flag("eval_listfile", "",
                    "File listing sample files in lstmf training format.")
    reg.int_flag("verbosity", 1,
                 "Amount of diagnosting information to output (0-2).")
    parse_command_line_flags(
        f"{argv[0]} --model m --eval_listfile f [--verbosity n]",
        argv, remove_flags=True, registry=reg)
    if not reg.get("model").value or not reg.get("eval_listfile").value:
        print("Error: --model and --eval_listfile are required",
              file=sys.stderr)
        return 1
    with open(reg.get("model").value, "rb") as f:
        model = load_traineddata(f.read())
    samples = _read_lstmf_listfile(reg.get("eval_listfile").value)
    if not samples:
        print("Error: no eval samples", file=sys.stderr)
        return 1
    truths = [s.transcription for s in samples]
    preds = decode_strips(model, _samples_to_strips(samples))
    verbosity = reg.get("verbosity").value
    for t, p in zip(truths, preds):
        if verbosity > 1 or (verbosity > 0 and t != p):
            print(f"Truth:{t}")
            print(f"OCR  :{p}")
    ce, nc, we, nw, _ex = _error_counts(truths, preds)
    print(f"BCER eval={100.0 * ce / max(1, nc):.3f}, "
          f"BWER eval={100.0 * we / max(1, nw):.3f}")
    return 0


TOOLS = {
    "wordlist2dawg": main_wordlist2dawg,
    "dawg2wordlist": main_dawg2wordlist,
    "unicharset_extractor": main_unicharset_extractor,
    "merge_unicharsets": main_merge_unicharsets,
    "combine_tessdata": main_combine_tessdata,
    "combine_lang_model": main_combine_lang_model,
    "text2image": main_text2image,
    "lstmtraining": main_lstmtraining,
    "lstmeval": main_lstmeval,
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv if argv is None else argv)
    if len(argv) < 2 or argv[1] not in TOOLS:
        print("Usage: python -m tesseract_spark.tools "
              f"{{{'|'.join(sorted(TOOLS))}}} [args...]", file=sys.stderr)
        return 1
    tool = argv[1]
    return TOOLS[tool]([tool] + argv[2:])


if __name__ == "__main__":
    sys.exit(main())
