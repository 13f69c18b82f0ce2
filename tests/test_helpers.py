"""parse_direction across the full input-shape matrix (mirrors reference tests/test_helpers.py)."""
import numpy as np
import pytest

from psa_tpu.utils.helpers import (direction_label, parse_direction, safe_divide,
                                   update_dict_recursively, validate_array_shape)

SQ2 = 1 / np.sqrt(2)
SQ3 = 1 / np.sqrt(3)


@pytest.mark.parametrize("spec,expected", [
    ('x', [1, 0, 0]), ('y', [0, 1, 0]), ('z', [0, 0, 1]),
    ('xy', [SQ2, SQ2, 0]), ('yx', [SQ2, SQ2, 0]),
    ('xz', [SQ2, 0, SQ2]), ('zx', [SQ2, 0, SQ2]),
    ('yz', [0, SQ2, SQ2]), ('zy', [0, SQ2, SQ2]),
    ('xyz', [SQ3, SQ3, SQ3]),
    ('100', [1, 0, 0]), ('010', [0, 1, 0]), ('001', [0, 0, 1]),
    ('110', [SQ2, SQ2, 0]), ('111', [SQ3, SQ3, SQ3]),
    ('X', [1, 0, 0]),  # case-insensitive
])
def test_named_strings(spec, expected):
    np.testing.assert_allclose(parse_direction(spec), expected, atol=1e-6)


@pytest.mark.parametrize("spec,expected", [
    (0, [1, 0, 0]), (90, [0, 1, 0]), (45.0, [SQ2, SQ2, 0]),
    ('45', [SQ2, SQ2, 0]), ('90.0', [0, 1, 0]),
    ([45.0], [SQ2, SQ2, 0]),
    (np.array(45.0), [SQ2, SQ2, 0]),        # 0-d array = angle
    ({'angle': 45}, [SQ2, SQ2, 0]),
])
def test_angles(spec, expected):
    np.testing.assert_allclose(parse_direction(spec), expected, atol=1e-6)


@pytest.mark.parametrize("spec,expected", [
    ([1, 0, 0], [1, 0, 0]),
    ((0, 2, 0), [0, 1, 0]),                  # normalized
    (np.array([1.0, 1.0, 0.0]), [SQ2, SQ2, 0]),
    ('1,1,0', [SQ2, SQ2, 0]),
    ('1 0 0', [1, 0, 0]),
    ({'h': 1, 'k': 1, 'l': 1}, [SQ3, SQ3, SQ3]),
    ({'h': 2}, [1, 0, 0]),                   # missing Miller components default 0
])
def test_vectors(spec, expected):
    np.testing.assert_allclose(parse_direction(spec), expected, atol=1e-6)


@pytest.mark.parametrize("spec,exc", [
    ([0, 0, 0], ValueError),
    (np.zeros(3), ValueError),
    ('bogus', ValueError),
    ('1,2', ValueError),
    ([1, 2], ValueError),
    ([1, 2, 3, 4], ValueError),
    (np.zeros((2, 3)), ValueError),
    ({'q': 1}, ValueError),
    (object(), TypeError),
    (None, TypeError),
])
def test_invalid(spec, exc):
    with pytest.raises(exc):
        parse_direction(spec)


def test_output_is_unit_norm_float32():
    v = parse_direction([3.0, 4.0, 0.0])
    assert v.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-6)


def test_update_dict_recursively():
    base = {'a': {'b': 1, 'c': 2}, 'd': 3}
    update_dict_recursively(base, {'a': {'b': 10}, 'e': 4})
    assert base == {'a': {'b': 10, 'c': 2}, 'd': 3, 'e': 4}


def test_safe_divide():
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([2.0, 0.0, 1.0])
    np.testing.assert_allclose(safe_divide(a, b), [0.5, 0.0, 3.0])
    np.testing.assert_allclose(safe_divide(a, b, fill_value=-1), [0.5, -1.0, 3.0])


def test_validate_array_shape():
    validate_array_shape(np.zeros((2, 3)), (2, 3), "x")
    with pytest.raises(ValueError, match="x has shape"):
        validate_array_shape(np.zeros((2, 3)), (3, 2), "x")


@pytest.mark.parametrize("spec,label", [
    (45.0, "45.0deg"),
    ('x', 'x'),
    ([1, 0, 0], '1.00_0.00_0.00'),
    ({'h': 1, 'k': 1, 'l': 0}, 'h1_k1_l0'),
])
def test_direction_label(spec, label):
    assert direction_label(spec) == label


class TestMillerDirection:
    """NPT-family direction parsing: UNNORMALIZED Miller vectors (the unit
    vector of [1,1,0] is not box-commensurate; the integer vector is)."""

    def test_named_forms_are_integer_miller(self):
        from psa_tpu.utils.helpers import parse_miller_direction
        np.testing.assert_array_equal(parse_miller_direction('xy'),
                                      [1, 1, 0])
        np.testing.assert_array_equal(parse_miller_direction('110'),
                                      [1, 1, 0])
        np.testing.assert_array_equal(parse_miller_direction('xyz'),
                                      [1, 1, 1])
        np.testing.assert_array_equal(parse_miller_direction('x'),
                                      [1, 0, 0])

    def test_vectors_and_dicts_pass_raw(self):
        from psa_tpu.utils.helpers import parse_miller_direction
        np.testing.assert_array_equal(parse_miller_direction([2, 0, 0]),
                                      [2, 0, 0])
        np.testing.assert_array_equal(parse_miller_direction("1, 1, 0"),
                                      [1, 1, 0])
        np.testing.assert_array_equal(
            parse_miller_direction({'h': 3, 'k': 0, 'l': 1}), [3, 0, 1])

    def test_zero_rejected_angle_falls_back(self):
        from psa_tpu.utils.helpers import parse_miller_direction
        with pytest.raises(ValueError):
            parse_miller_direction([0, 0, 0])
        v = parse_miller_direction(90.0)        # angle: unit-vector fallback
        np.testing.assert_allclose(v, [0, 1, 0], atol=1e-7)

    def test_miller_line_shared_construction(self):
        from psa_tpu.utils.helpers import miller_line
        m = miller_line('xy', 4, 4.0)
        np.testing.assert_allclose(m[:, 0], [1, 2, 3, 4])
        np.testing.assert_allclose(m[:, 1], [1, 2, 3, 4])
        np.testing.assert_allclose(m[:, 2], 0)
        with pytest.raises(ValueError):
            miller_line('x', 0, 1.0)
        with pytest.raises(ValueError):
            miller_line('x', 4, -1.0)
