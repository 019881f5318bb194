"""String-tensor ops (trace-time islands) + TfIdfVectorizer + ImageDecoder.

String tensors exist only at trace time on TPU; graphs here use string
initializers/Constants and numeric final outputs (the run-time contract),
plus the explicit string-output rejection test.
"""

import io

import numpy as np
import pytest

from lele_tpu.onnx import builder as ob
from optest import run_graph, run_op


def _strings(*vals):
    a = np.empty(len(vals), dtype=object)
    a[:] = vals
    return a


def test_string_concat_then_regex():
    x = _strings("foo", "bar", "baz")
    y = _strings("_1", "_2", "_3")
    nodes = [
        ob.node("StringConcat", ["x", "y"], ["xy"]),
        ob.node("RegexFullMatch", ["xy"], ["m"], pattern=r"ba._\d"),
    ]
    got = run_graph(
        nodes, {"inp": np.zeros(1, np.float32)}, ["m"],
        initializers={"x": x, "y": y},
    )[0]
    np.testing.assert_array_equal(got, [False, True, True])


def test_string_split_counts():
    x = _strings("a,b,c", "x", "", "p,q")
    nodes = [ob.node("StringSplit", ["x"], ["toks", "n"], delimiter=",")]
    got = run_graph(
        nodes, {"inp": np.zeros(1, np.float32)}, ["n"],
        initializers={"x": x},
    )[0]
    # "".split(",") == [""] → count 1 (ONNX keeps empties for explicit delim)
    np.testing.assert_array_equal(got, [3, 1, 1, 2])


def test_string_split_whitespace_mode():
    x = _strings("  hello   world ", "one")
    nodes = [ob.node("StringSplit", ["x"], ["toks", "n"])]
    got = run_graph(
        nodes, {"inp": np.zeros(1, np.float32)}, ["n"],
        initializers={"x": x},
    )[0]
    np.testing.assert_array_equal(got, [2, 1])


def test_string_normalizer_stopwords_case():
    x = _strings("The", "cat", "AND", "the", "Dog")
    nodes = [
        ob.node("StringNormalizer", ["x"], ["y"],
                case_change_action="LOWER", is_case_sensitive=0,
                stopwords=["the", "and"]),
        ob.node("RegexFullMatch", ["y"], ["m"], pattern="cat|dog"),
    ]
    got = run_graph(
        nodes, {"inp": np.zeros(1, np.float32)}, ["m"],
        initializers={"x": x},
    )[0]
    np.testing.assert_array_equal(got, [True, True])


def test_string_output_rejected():
    x = _strings("a", "b")
    nodes = [ob.node("StringConcat", ["x", "x"], ["y"])]
    with pytest.raises(NotImplementedError, match="STRING tensor"):
        run_graph(nodes, {"inp": np.zeros(1, np.float32)}, ["y"],
                  initializers={"x": x})


def test_string_roundtrip_through_wire():
    """String initializers survive encode→decode (data_type 8)."""
    from lele_tpu.onnx import OnnxModel

    x = _strings("héllo", "wörld")
    bs = ob.build_model_bytes(
        [ob.node("RegexFullMatch", ["x"], ["m"], pattern=".*o.*")],
        inputs=[ob.value_info("inp", 1, [1])],
        outputs=[ob.value_info("m", 9, [2])],
        initializers=[ob.tensor_from_array(x, "x")],
    )
    m = OnnxModel.from_bytes(bs)
    arr = m.initializer_array("x")
    assert list(arr) == ["héllo", "wörld"]


# --- TfIdfVectorizer --------------------------------------------------------

TFIDF_ATTRS = dict(
    min_gram_length=1, max_gram_length=2, max_skip_count=0,
    ngram_counts=[0, 3], ngram_indexes=[0, 1, 2, 3, 4],
    pool_int64s=[2, 3, 5, 2, 3, 5, 9],  # unigrams {2,3,5}, bigrams {23,59}
)


def test_tfidf_tf_int_dynamic():
    x = np.array([[2, 3, 5, 9, 2], [5, 9, 5, 9, 5]], dtype=np.int64)
    got = run_op("TfIdfVectorizer", {"x": x}, mode="TF", **TFIDF_ATTRS)[0]
    want = np.array([
        [2, 1, 1, 1, 1],   # 2×2, 3, 5, "2 3", "5 9" (at x[2:4])
        [0, 0, 3, 0, 2],   # 5×3, "5 9"×2
    ], dtype=np.float32)
    np.testing.assert_array_equal(got, want)


def test_tfidf_skips_and_1d():
    x = np.array([2, 7, 3, 7, 5], dtype=np.int64)
    got = run_op("TfIdfVectorizer", {"x": x}, mode="TF",
                 **{**TFIDF_ATTRS, "max_skip_count": 1})[0]
    # skip 0: no adjacent pool bigrams; skip 1: (2,3) at stride 2, (3,5)?
    # pool bigrams are (2,3) and (5,9): (2,_,3) matches with skip 1
    want = np.array([1, 1, 1, 1, 0], dtype=np.float32)
    np.testing.assert_array_equal(got, want)


def test_tfidf_tfidf_weights():
    x = np.array([[2, 3, 5, 9, 2]], dtype=np.int64)
    w = [0.5, 1.0, 2.0, 4.0, 8.0]
    got = run_op("TfIdfVectorizer", {"x": x}, mode="TFIDF",
                 weights=w, **TFIDF_ATTRS)[0]
    np.testing.assert_allclose(got, [[1.0, 1.0, 2.0, 4.0, 8.0]])
    got_idf = run_op("TfIdfVectorizer", {"x": x}, mode="IDF",
                     weights=w, **TFIDF_ATTRS)[0]
    np.testing.assert_allclose(got_idf, [[0.5, 1.0, 2.0, 4.0, 8.0]])


def test_tfidf_strings_fold():
    x = _strings("the", "cat", "sat", "the", "cat")
    attrs = dict(
        min_gram_length=1, max_gram_length=2, max_skip_count=0,
        ngram_counts=[0, 2], ngram_indexes=[0, 1, 2],
        pool_strings=["cat", "sat", "the", "cat"],
    )
    nodes = [ob.node("TfIdfVectorizer", ["x"], ["y"], mode="TF", **attrs)]
    got = run_graph(
        nodes, {"inp": np.zeros(1, np.float32)}, ["y"],
        initializers={"x": x},
    )[0]
    # unigrams: cat×2, sat×1; bigram "the cat"×2
    np.testing.assert_array_equal(got, [2, 1, 2])


# --- ImageDecoder -----------------------------------------------------------


@pytest.mark.parametrize("fmt", ["RGB", "BGR", "Grayscale"])
def test_image_decoder_png(fmt):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (5, 7, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")  # lossless
    enc = np.frombuffer(buf.getvalue(), dtype=np.uint8)
    nodes = [
        ob.node("ImageDecoder", ["enc"], ["img"], pixel_format=fmt),
        ob.node("Cast", ["img"], ["imgf"], to=1),
        ob.node("Add", ["imgf", "zero"], ["y"]),
    ]
    got = run_graph(
        nodes, {"zero": np.zeros((1,), np.float32)}, ["y"],
        initializers={"enc": enc},
    )[0]
    if fmt == "RGB":
        want = img
    elif fmt == "BGR":
        want = img[..., ::-1]
    else:
        want = np.asarray(Image.fromarray(img).convert("L"))[..., None]
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_image_decoder_dynamic_raises():
    enc = np.zeros(16, np.uint8)
    with pytest.raises(Exception, match="trace time|host"):
        run_op("ImageDecoder", {"enc": enc})
