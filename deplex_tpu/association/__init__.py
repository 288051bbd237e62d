"""Temporal plane association (parity namespace).

The reference reserves `deplex.association` with a placeholder
(/root/reference/python/deplex/association/foo.py:4-5 returns a constant);
here the namespace hosts the real capability: frame-to-map plane matching
from the SLAM stack.
"""

from deplex_tpu.slam.association import AssociationParams, Matches, associate


def foo() -> None:
    """Reference-parity stub (python/deplex/association/foo.py:4-5)."""
    print("Foo")


__all__ = ["AssociationParams", "Matches", "associate", "foo"]
