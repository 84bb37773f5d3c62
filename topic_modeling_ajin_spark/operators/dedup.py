"""(round 1) placeholder — operators land incrementally."""
