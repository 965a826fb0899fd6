"""Fuzz-style robustness: corrupt/truncated model files must raise clean
format errors (ValueError family), never crash, hang, or allocate wildly.

Mirrors the reliability expectation on the reference's Kaldi binaries,
which abort with a parse error on malformed input rather than UB."""

import io

import numpy as np
import pytest

from rhasspy_speech_tpu.io.kaldi_io import KaldiFormatError, KaldiReader, KaldiWriter
from rhasspy_speech_tpu.io.nnet3_file import read_am_nnet3, write_nnet3
from rhasspy_speech_tpu.io.openfst import (
    OpenFstFormatError,
    read_openfst,
    write_openfst,
)
from rhasspy_speech_tpu.io.transition_model import KaldiTransitionModel

ACCEPTED = (KaldiFormatError, OpenFstFormatError, ValueError, KeyError,
            IndexError, EOFError, NotImplementedError)


def _valid_mdl_bytes():
    from tests.test_kaldi_io import _synthetic_tdnnf_spec

    spec = _synthetic_tdnnf_spec(np.random.RandomState(0))
    ktm = KaldiTransitionModel.from_monophone_chain(4)
    buf = io.BytesIO()
    write_nnet3(buf, spec, transition_model=ktm)
    return buf.getvalue()


def _valid_fst_bytes():
    from rhasspy_speech_tpu.fst.core import Fst

    fst = Fst()
    fst.add_states(3)
    fst.start = 0
    fst.add_arc(0, 1, 2, 0.5, 1)
    fst.add_arc(1, 3, 4, 0.25, 2)
    fst.set_final(2, 0.0)
    buf = io.BytesIO()
    write_openfst(buf, fst)
    return buf.getvalue()


def _parse_mdl_bytes(data, tmp_path, name="m.mdl"):
    path = tmp_path / name
    path.write_bytes(bytes(data))
    return read_am_nnet3(str(path))


def _expect_clean_failure(parse, data):
    try:
        parse(data)
    except ACCEPTED:
        return
    except MemoryError:
        pytest.fail("reader attempted a wild allocation")
    # parsers may legitimately succeed on some mutations (e.g. a flipped
    # bit inside float payload bytes)


def test_truncated_mdl_raises(tmp_path):
    data = _valid_mdl_bytes()
    for cut in (0, 1, 2, 7, len(data) // 4, len(data) // 2, len(data) - 3):
        with pytest.raises(ACCEPTED):
            _parse_mdl_bytes(data[:cut], tmp_path)


def test_bitflipped_mdl_never_crashes(tmp_path):
    data = bytearray(_valid_mdl_bytes())
    rng = np.random.RandomState(1)
    for _ in range(60):
        pos = int(rng.randint(0, len(data)))
        mutated = bytearray(data)
        mutated[pos] ^= 1 << int(rng.randint(0, 8))
        _expect_clean_failure(lambda d: _parse_mdl_bytes(d, tmp_path), mutated)


def test_random_garbage_mdl_raises(tmp_path):
    rng = np.random.RandomState(2)
    for n in (0, 1, 10, 100, 4096):
        blob = rng.bytes(n)
        with pytest.raises(ACCEPTED):
            _parse_mdl_bytes(blob, tmp_path)


def test_truncated_fst_raises():
    data = _valid_fst_bytes()
    for cut in (0, 3, 8, len(data) // 2, len(data) - 2):
        with pytest.raises(ACCEPTED):
            read_openfst(io.BytesIO(data[:cut]))


def test_bitflipped_fst_never_crashes():
    data = bytearray(_valid_fst_bytes())
    rng = np.random.RandomState(3)
    for _ in range(60):
        pos = int(rng.randint(0, len(data)))
        mutated = bytearray(data)
        mutated[pos] ^= 1 << int(rng.randint(0, 8))
        _expect_clean_failure(
            lambda d: read_openfst(io.BytesIO(bytes(d))), mutated
        )


def test_text_mode_mdl_clear_error(tmp_path):
    """Kaldi text-mode files (no \\0B header) fail with a clear message."""
    with pytest.raises(ACCEPTED):
        _parse_mdl_bytes(b"<TransitionModel> <Topology>", tmp_path)


def test_reader_vector_count_guard():
    """A header claiming a giant vector must not allocate it."""
    buf = io.BytesIO()
    w = KaldiWriter(buf)
    w.write_token("FV")
    buf.write(b"\x04")
    buf.write((2**31 - 1).to_bytes(4, "little"))  # count: ~2G floats
    buf.seek(0)
    with pytest.raises(ACCEPTED):
        KaldiReader(buf).read_vector()


def _valid_tree_bytes():
    from rhasspy_speech_tpu.io.transition_model import KaldiTransitionModel
    from rhasspy_speech_tpu.io.tree import ContextDependencyTree

    ktm = KaldiTransitionModel.from_monophone_chain(4)
    tree = ContextDependencyTree.monophone_from_tuples(
        ktm.tuples, max_phone=4, n=3, p=1
    )
    buf = io.BytesIO()
    tree.write(KaldiWriter(buf))
    return buf.getvalue()


def test_tree_reader_robustness():
    from rhasspy_speech_tpu.io.tree import ContextDependencyTree

    data = _valid_tree_bytes()
    rng = np.random.RandomState(5)
    for cut in (0, 1, 5, len(data) // 2, len(data) - 2):
        with pytest.raises(ACCEPTED):
            ContextDependencyTree.read(KaldiReader(io.BytesIO(data[:cut])))
    for _ in range(40):
        pos = int(rng.randint(0, len(data)))
        m = bytearray(data)
        m[pos] ^= 1 << int(rng.randint(0, 8))
        _expect_clean_failure(
            lambda d: ContextDependencyTree.read(
                KaldiReader(io.BytesIO(bytes(d)))
            ),
            m,
        )


def _valid_ivector_files():
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tests")
    from tests.test_ivector import _synthetic_system

    rng = np.random.RandomState(6)
    dubm, extractor, _lda = _synthetic_system(rng)
    b1, b2 = io.BytesIO(), io.BytesIO()
    dubm.write(KaldiWriter(b1))
    extractor.write(KaldiWriter(b2))
    return b1.getvalue(), b2.getvalue()


def test_ivector_readers_robustness():
    from rhasspy_speech_tpu.io.ivector import DiagGmm, IvectorExtractor

    dubm_bytes, ie_bytes = _valid_ivector_files()
    rng = np.random.RandomState(7)
    for data, reader in ((dubm_bytes, DiagGmm.read),
                         (ie_bytes, IvectorExtractor.read)):
        # (cutting only the final byte clips the end-token's trailing
        # space, which parses to the identical object — benign)
        for cut in (0, 2, len(data) // 3, len(data) - 8):
            with pytest.raises(ACCEPTED):
                reader(KaldiReader(io.BytesIO(data[:cut])))
        for _ in range(40):
            pos = int(rng.randint(0, len(data)))
            m = bytearray(data)
            m[pos] ^= 1 << int(rng.randint(0, 8))
            _expect_clean_failure(
                lambda d, r=reader: r(KaldiReader(io.BytesIO(bytes(d)))), m
            )


def test_lattice_reader_robustness():
    from rhasspy_speech_tpu.io.lattice_io import (
        KaldiCompactLattice,
        read_lattice,
        write_compact_lattice,
    )

    lat = KaldiCompactLattice()
    for _ in range(3):
        lat.add_state()
    lat.start = 0
    lat.arcs[0].append((5, 1.0, 2.0, (3, 4), 1))
    lat.arcs[1].append((6, 0.5, 0.5, (), 2))
    lat.finals[2] = (0.0, 0.0, ())
    buf = io.BytesIO()
    write_compact_lattice(buf, lat)
    data = buf.getvalue()
    rng = np.random.RandomState(8)
    for cut in range(0, len(data), 5):
        try:
            read_lattice(io.BytesIO(data[:cut]))
        except ACCEPTED:
            pass
    for _ in range(200):
        pos = int(rng.randint(0, len(data)))
        m = bytearray(data)
        m[pos] ^= 1 << int(rng.randint(0, 8))
        _expect_clean_failure(lambda d: read_lattice(io.BytesIO(bytes(d))), m)
