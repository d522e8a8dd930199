"""Engine scalar-function families: vector math and text analysis."""
