"""Host pipeline layer: container format, codec registry, block runner.

Replaces the reference's L4/L5 host machinery (CULZSS bookkeeping header
`culzss.c:220-264`, bsc 28-byte block headers `libbsc.cpp:211-219`,
bzlib stream splicing `bzlib.c:480-560`) with one container in which
every block is independently decodable — which is also what enables
elastic multi-host decode (SURVEY.md §5).
"""

from tpulc.pipeline.container import Container, BlockInfo  # noqa: F401
from tpulc.pipeline.registry import available_codecs, get_codec  # noqa: F401
