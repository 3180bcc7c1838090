from shaclex_ray.rdfio.turtle import parse_turtle, TurtleError

__all__ = ["parse_turtle", "TurtleError"]
