"""Import every operator module for its registration side-effects.

Kept in one place so a broken module is discovered at import time, and the
driver's ``queries()`` always reflects exactly what is implemented.
"""

from __future__ import annotations

from .functions import (  # noqa: F401
    curation,
    multimodal,
    scalar,
    similarity,
    text,
    training,
    udfs,
    vectors,
)
from .operators import (  # noqa: F401
    aggregates,
    analytics,
    analytics_ext,
    bloom,
    evaluation,
    features,
    graph,
    inference,
    joins,
    maintenance,
    ordinal,
    pipeline,
    ranking,
    relational,
    reshape,
    scale,
    setops,
    sorts,
    statistics,
    sweep,
    windows,
)
from .sources import batch, stream_entries, txnlog  # noqa: F401
from .streaming import core, offsets, stateful  # noqa: F401
