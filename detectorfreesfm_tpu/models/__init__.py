"""Model zoo: coarse matcher families + refinement matcher.

Factory parity with the reference's matcher selection
(src/coarse_match/coarse_match_worker.py:21-100 builds loftr | aspan |
matchformer from config): `build_matcher(name)` returns a Flax module with
the shared (image0, image1[, valid_hw0, valid_hw1]) -> MatchOutput contract.
"""

from __future__ import annotations

import dataclasses


def build_matcher(name: str = "loftr", **overrides):
    """Return an initialized-config matcher module for `name`.

    Names: "loftr" (default coarse matcher), "aspan" (flow-guided adaptive
    span), "matchformer" (attention-in-backbone extract-and-match).
    Keyword overrides are applied to the matcher's config dataclass.
    """
    name = name.lower()
    if name in ("loftr", "loftr_official", "detectorfree"):
        from .loftr import DetectorFreeMatcher, MatcherConfig

        return DetectorFreeMatcher(
            dataclasses.replace(MatcherConfig(), **overrides)
        )
    if name in ("aspan", "aspanformer"):
        from .aspan import ASpanConfig, ASpanMatcher

        return ASpanMatcher(dataclasses.replace(ASpanConfig(), **overrides))
    if name in ("matchformer",):
        from .matchformer import MatchFormerConfig, MatchFormerMatcher

        return MatchFormerMatcher(
            dataclasses.replace(MatchFormerConfig(), **overrides)
        )
    raise ValueError(f"unknown matcher '{name}'")
