"""Training runtime: losses, optimizer stack, jitted train step, host loop."""
