"""Relational basics (examples/basic_relational.rs).

Run: python examples/basic_relational.py
"""

from neumann_tpu.router import QueryRouter
from neumann_tpu.shell import format_result


def main():
    r = QueryRouter()
    for q in [
        "CREATE TABLE users (id INT PRIMARY KEY, name TEXT NOT NULL, "
        "age INT, email TEXT UNIQUE)",
        "CREATE TABLE orders (user_id INT REFERENCES users(id) "
        "ON DELETE CASCADE, total FLOAT)",
        "INSERT INTO users VALUES (1, 'Alice', 34, 'a@x.com'), "
        "(2, 'Bob', 28, 'b@x.com'), (3, 'Carol', 41, 'c@x.com')",
        "INSERT INTO orders VALUES (1, 99.5), (1, 12.0), (2, 40.0)",
        "SELECT name, age FROM users WHERE age > 30 ORDER BY age DESC",
        "SELECT u.name, o.total FROM users u "
        "INNER JOIN orders o ON u.id = o.user_id",
        "SELECT user_id, SUM(total) AS spend FROM orders "
        "GROUP BY user_id HAVING spend > 20",
        "DELETE FROM users WHERE id = 1",   # cascades to orders
        "SELECT COUNT(*) AS remaining_orders FROM orders",
    ]:
        print(f"> {q}")
        print(format_result(r.execute(q)))
        print()


if __name__ == "__main__":
    main()
