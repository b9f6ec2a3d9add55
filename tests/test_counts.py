"""Registry-count drift guard as part of the default test run — README and
SURVEY must state the real registry totals (they drifted twice in round 5)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_doc_counts_match_registry():
    import check_counts

    errors = check_counts.check()
    assert not errors, "\n".join(errors)
