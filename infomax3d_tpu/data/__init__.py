from infomax3d_tpu.data.synthetic import SyntheticMolecules

__all__ = ["SyntheticMolecules"]
