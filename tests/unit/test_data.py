import numpy as np
import pytest

from molvax.data import (
    BatchIterator,
    DEFAULT_CHARSET,
    Dataset,
    decode_codes,
    load_dataset,
    load_h5,
    load_smiles_file,
    surrogate_properties,
    synthetic_dataset,
    synthetic_smiles,
    valid_fraction,
)


def test_synthetic_deterministic():
    a = synthetic_smiles(50, seed=3)
    b = synthetic_smiles(50, seed=3)
    c = synthetic_smiles(50, seed=4)
    assert a == b
    assert a != c


def test_synthetic_grammar_valid():
    s = synthetic_smiles(200, seed=0)
    assert valid_fraction(s) == 1.0
    assert all(8 <= len(x) <= 118 for x in s)


def test_synthetic_dataset_roundtrip():
    ds = synthetic_dataset(100, max_len=120, seed=1)
    assert ds.codes.shape == (100, 120)
    back = decode_codes(ds.codes, ds.charset)
    assert all(len(s) > 0 for s in back)


def test_split():
    ds = synthetic_dataset(100, seed=0)
    tr, te = ds.split(test_fraction=0.2, seed=0)
    assert len(tr) == 80 and len(te) == 20


def test_surrogate_properties():
    ds = synthetic_dataset(50, seed=0, with_properties=True)
    assert ds.properties.shape == (50, 3)
    assert np.isfinite(ds.properties).all()
    # deterministic
    np.testing.assert_array_equal(
        ds.properties, surrogate_properties(ds.codes, ds.charset)
    )


def test_h5_roundtrip(tmp_path):
    """Write a chemvae-format .h5 (one-hot float + charset) and load it."""
    import h5py

    ds = synthetic_dataset(20, max_len=40, seed=0)
    onehot = np.eye(ds.charset.size, dtype=np.float32)[ds.codes]
    p = str(tmp_path / "zinc.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("data_train", data=onehot)
        f.create_dataset("data_test", data=onehot[:5])
        f.create_dataset(
            "charset", data=np.array([c.encode() for c in ds.charset.chars])
        )
    loaded = load_h5(p)
    np.testing.assert_array_equal(loaded.codes, ds.codes)
    assert loaded.charset.chars == ds.charset.chars


def test_smiles_file_loader(tmp_path):
    p = tmp_path / "mols.smi"
    p.write_text("smiles\nCCO\nc1ccccc1 name2\nCC(=O)N,0.5\n")
    ds = load_smiles_file(str(p), DEFAULT_CHARSET, max_len=60)
    assert decode_codes(ds.codes, ds.charset) == ["CCO", "c1ccccc1", "CC(=O)N"]


def test_load_dataset_dispatch(tmp_path):
    ds = load_dataset("synthetic", synthetic_n=30)
    assert len(ds) == 30
    with pytest.raises(FileNotFoundError):
        load_dataset(str(tmp_path / "missing.h5"))


def test_batch_iterator_shapes_and_coverage():
    ds = synthetic_dataset(64, seed=0, with_properties=True)
    it = BatchIterator(ds, batch_size=16, seed=0, with_properties=True)
    assert it.steps_per_epoch == 4
    codes, props = next(it)
    assert codes.shape == (16, 120)
    assert props.shape == (16, 3)
    # one epoch covers all samples exactly once
    seen = set(np.asarray(codes)[:, 0:5].tobytes() for _ in [0])
    total = [np.asarray(codes)]
    for _ in range(3):
        c, _p = next(it)
        total.append(np.asarray(c))
    allrows = np.concatenate(total)
    assert allrows.shape[0] == 64
    uniq = np.unique(allrows, axis=0)
    assert uniq.shape[0] == np.unique(ds.codes, axis=0).shape[0]


def test_batch_iterator_tiles_small_dataset():
    ds = synthetic_dataset(5, seed=0)
    it = BatchIterator(ds, batch_size=16, seed=0)
    codes, _ = next(it)
    assert codes.shape == (16, 120)


def test_export_h5_roundtrip(tmp_path):
    """export_h5 emits the chemvae layout; load_h5 round-trips it."""
    from molvax.data import export_h5

    ds = synthetic_dataset(30, max_len=40, seed=5)
    p = str(tmp_path / "export.h5")
    export_h5(ds, p, test_fraction=0.2, seed=0)
    import h5py

    with h5py.File(p) as f:
        assert set(f.keys()) == {"data_train", "data_test", "charset"}
        assert f["data_train"].shape[1:] == (40, ds.charset.size)
        assert f["data_train"].dtype == np.float32
    back = load_h5(p, "data_train")
    assert back.charset.chars == ds.charset.chars
    assert back.codes.shape == (24, 40)
    # every exported row decodes to a string from the source set
    src = set(decode_codes(ds.codes, ds.charset))
    assert set(decode_codes(back.codes, back.charset)) <= src


def test_batch_iterator_rejects_empty_dataset():
    from molvax.data.charset import DEFAULT_CHARSET
    from molvax.data.pipeline import BatchIterator
    from molvax.data.zinc import Dataset

    empty = Dataset(np.zeros((0, 16), np.uint8), DEFAULT_CHARSET)
    with pytest.raises(ValueError, match="empty corpus"):
        BatchIterator(empty, batch_size=4)


def test_split_never_floors_holdout_to_zero():
    from molvax.data import synthetic_dataset

    ds = synthetic_dataset(16, max_len=48, seed=0)
    train, test = ds.split(test_fraction=0.05)
    assert len(test) >= 1 and len(train) + len(test) == 16


def test_smiles_file_name_column(tmp_path):
    # conventional .smi rows carry a name after whitespace
    p = tmp_path / "named.smi"
    p.write_text("smiles name\nCCO ethanol\nc1ccccc1 benzene\n")
    from molvax.data.zinc import load_smiles_file

    ds = load_smiles_file(str(p), max_len=48)
    assert len(ds) == 2


def test_h5_property_roundtrip(tmp_path):
    """Property targets persist through the .h5 interchange (additive
    properties_train/test datasets), so corpus-scale descriptor passes run
    once at export time."""
    from molvax.data import synthetic_dataset
    from molvax.data.zinc import export_h5, load_h5

    ds = synthetic_dataset(40, max_len=48, seed=0, with_properties=True)
    assert ds.properties is not None
    p = tmp_path / "with_props.h5"
    export_h5(ds, str(p), test_fraction=0.25, seed=0)
    tr = load_h5(str(p), "data_train")
    te = load_h5(str(p), "data_test")
    assert tr.properties is not None and te.properties is not None
    assert tr.properties.shape == (len(tr), ds.properties.shape[1])
    assert te.properties.shape == (len(te), ds.properties.shape[1])
    # rows pair with their codes: re-split the source and compare
    train_src, test_src = ds.split(0.25, 0)
    np.testing.assert_allclose(tr.properties, train_src.properties, rtol=1e-6)
    np.testing.assert_allclose(te.properties, test_src.properties, rtol=1e-6)
