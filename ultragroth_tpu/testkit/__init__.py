"""Circuit/zkey synthesis: fixtures and synthetic benchmark circuits."""
