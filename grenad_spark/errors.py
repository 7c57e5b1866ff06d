"""Engine exception hierarchy — the grenad Error taxonomy as Python types.

Reference src/error.rs:6-15: Io / Merge(U) / InvalidCompressionType /
InvalidFormatVersion. Io maps to the host's native OSError/IOError; the other
three get first-class engine types so callers can catch engine failures
without pattern-matching raw Py4J/Spark exceptions.
"""

from __future__ import annotations


class GrenadSparkError(Exception):
    """Base class for all engine errors."""


class MergeError(GrenadSparkError):
    """A merge failed (Error::Merge analog): unknown merge function, too many
    generations, or incompatible inputs."""


class InvalidCompressionType(GrenadSparkError):
    """Unknown payload codec (Error::InvalidCompressionType analog,
    src/compression.rs:31-41 from_u8 -> None)."""


class InvalidFormatVersion(GrenadSparkError):
    """Index manifest format_version is newer than this engine understands
    (Error::InvalidFormatVersion analog; src/metadata.rs version dispatch)."""


class InvalidKeyOrder(GrenadSparkError):
    """Writer::insert key-order contract violated: keys must be strictly
    increasing within a sorted run (src/writer.rs insert precondition)."""
