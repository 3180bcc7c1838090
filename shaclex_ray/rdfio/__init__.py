from shaclex_ray.rdfio.turtle import parse_turtle, TurtleError
from shaclex_ray.rdfio.rdfxml import parse_rdfxml, RdfXmlError

__all__ = ["parse_turtle", "TurtleError", "parse_rdfxml", "RdfXmlError"]
