"""PyTerrier adapter: import gating (python-terrier is optional)."""

import importlib.util
import unittest


class TestPyTerrierGating(unittest.TestCase):
    def test_import_behavior(self):
        if importlib.util.find_spec("pyterrier") is None:
            with self.assertRaises(ImportError):
                import fastforward_tpu.utils.pyterrier  # noqa: F401
        else:  # pragma: no cover - environment-dependent
            from fastforward_tpu.utils.pyterrier import FFInterpolate, FFScore

            self.assertTrue(callable(FFScore))
            self.assertEqual(0.3, FFInterpolate(0.3).alpha)


if __name__ == "__main__":
    unittest.main()
